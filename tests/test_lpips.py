"""LPIPS(alex) JAX implementation: architecture + loader (weights are not
shipped; a random-weight npz validates the graph and metric properties)."""
import numpy as np
import pytest


def _random_weights(tmp_path):
    rng = np.random.RandomState(0)
    convs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
             (256, 256, 3)]
    z = {}
    for fid, (o, i, k) in zip((0, 3, 6, 8, 10), convs):
        z[f"features.{fid}.weight"] = rng.randn(o, i, k, k).astype(
            np.float32) * 0.05
        z[f"features.{fid}.bias"] = np.zeros(o, np.float32)
    for li, c in enumerate((64, 192, 384, 256, 256)):
        z[f"lin.{li}.weight"] = np.abs(
            rng.randn(1, c, 1, 1)).astype(np.float32) * 0.1
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **z)
    return path


def test_lpips_metric_properties(tmp_path):
    import jax.numpy as jnp
    from gsl_tpu.ops.lpips import load_weights, lpips

    w = load_weights(_random_weights(tmp_path))
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    d_aa = float(lpips(a, a, w))
    d_ab = float(lpips(a, b, w))
    d_ba = float(lpips(b, a, w))
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 1e-4
    assert d_ab == pytest.approx(d_ba, rel=1e-4)
    # small perturbation -> small distance
    d_eps = float(lpips(a, a + 0.01, w))
    assert 0 < d_eps < d_ab


def test_lpips_absent_weights(tmp_path, monkeypatch):
    from gsl_tpu.ops import lpips as L
    monkeypatch.setenv("GSL_LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    L.get_lpips_fn.cache_clear()
    assert L.get_lpips_fn() is None
    L.get_lpips_fn.cache_clear()

"""Hash-grid encoding unit tests (reference: tcnn HashGrid semantics,
/root/reference/internal/configs/tcnn_encoding_config.py:37-50)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsl_tpu.models.encodings import (HashGridEncoding,
                                      _hash_level_resolutions,
                                      hash_grid_lookup)

PRIMES = (1, 2654435761, 805459861)


def _numpy_lookup(table, x, res, hashmap_size):
    """Straightforward numpy re-derivation of the hashed d-linear lerp."""
    table = np.asarray(table)
    x = np.asarray(x)
    d = x.shape[-1]
    pos = np.clip(x, 0.0, 1.0) * res
    p0 = np.clip(np.floor(pos).astype(np.int64), 0, res - 1)
    frac = pos - p0
    dense = (res + 1) ** d <= hashmap_size
    out = np.zeros(x.shape[:-1] + (table.shape[-1],), np.float64)
    for corner in range(2 ** d):
        bits = [(corner >> (d - 1 - i)) & 1 for i in range(d)]
        pc = p0 + np.asarray(bits)
        if dense:
            idx = pc[..., 0]
            for i in range(1, d):
                idx = idx * (res + 1) + pc[..., i]
        else:
            # int32 wraparound arithmetic, exactly like the device code
            idx = (pc[..., 0].astype(np.int64) * PRIMES[0]).astype(np.int32)
            for i in range(1, d):
                m = (pc[..., i].astype(np.int64) * PRIMES[i]).astype(
                    np.uint32).astype(np.int32)
                idx = idx ^ m
            idx = np.mod(idx, hashmap_size)
        w = np.ones(x.shape[:-1])
        for i in range(d):
            w = w * (frac[..., i] if bits[i] else 1.0 - frac[..., i])
        out += w[..., None] * table[idx]
    return out


@pytest.mark.parametrize("d,res,size", [
    (2, 8, 1 << 14),      # dense (81 vertices fit)
    (3, 64, 1 << 12),     # hashed (274625 vertices > 4096)
    (3, 15, 1 << 19),     # dense 3D
])
def test_hash_grid_lookup_matches_numpy(d, res, size):
    rng = np.random.RandomState(0)
    table = rng.randn(min(size, (res + 1) ** d), 4).astype(np.float32)
    size_eff = table.shape[0]
    x = rng.rand(257, d).astype(np.float32)
    got = np.asarray(hash_grid_lookup(jnp.asarray(table), jnp.asarray(x),
                                      res, size_eff))
    want = _numpy_lookup(table, x, res, size_eff)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_level_resolutions_growth():
    res = _hash_level_resolutions(8, 16, 2048)
    assert res[0] == 16 and res[-1] == 2048
    assert all(b > a for a, b in zip(res, res[1:]))


def test_hash_grid_encoding_trains():
    enc = HashGridEncoding(n_input_dims=3, n_levels=4, base_resolution=4,
                           max_resolution=64, log2_hashmap_size=10,
                           n_features_per_level=2)
    x = jnp.asarray(np.random.RandomState(1).rand(32, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (32, 8)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # interpolation is continuous: nearby points give nearby encodings
    eps = 1e-4
    out2 = enc.apply(params, x + eps)
    assert float(jnp.abs(out - out2).max()) < 0.05


def test_visibility_network_hash_variant():
    from gsl_tpu.training.visibility_map_trainer import VisibilityNetwork
    net = VisibilityNetwork(n_images=16, grid_type="hash", n_levels=4,
                            base_resolution=4, max_resolution=32,
                            log2_hashmap_size=10)
    uv = jnp.asarray(np.random.RandomState(2).rand(10, 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), uv, jnp.zeros((), jnp.int32))
    out = net.apply(params, uv, jnp.asarray(3, jnp.int32))
    assert out.shape == (10,)
    # distinct images see distinct encodings (the index rides as a third
    # hash coordinate)
    out2 = net.apply(params, uv, jnp.asarray(7, jnp.int32))
    assert float(jnp.abs(out - out2).max()) > 0

"""Pallas surfel (2DGS) kernel vs the XLA oracle (ops/surfel.py).

Reference semantics: diff-surfel-rasterization as wrapped by
/root/reference/internal/renderers/vanilla_2dgs_renderer.py:14-186."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsl_tpu.ops.projection import Projections
from gsl_tpu.ops.rasterize_pallas import isect_encode_padded
from gsl_tpu.ops.surfel import project_surfels, rasterize_surfels
from gsl_tpu.ops.surfel_pallas import rasterize_surfels_pallas
from gsl_tpu.ops.tiling import isect_encode

H = W = 48
TS = 16


def _scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(rng.randn(n, 3) * 0.7, jnp.float32)
    scales = jnp.asarray(rng.rand(n, 2) * 0.3 + 0.05, jnp.float32)
    quats = jnp.asarray(rng.randn(n, 4), jnp.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 4.0
    proj = project_surfels(means, scales, quats, jnp.asarray(w2c),
                           60.0, 60.0, W / 2, H / 2, W, H)
    op = jnp.asarray(rng.rand(n) * 0.7 + 0.2, jnp.float32)
    ch = jnp.asarray(rng.rand(n, 6), jnp.float32)
    return proj, op, ch


def _shim(proj, cap):
    r2 = jnp.maximum(proj.radii.astype(jnp.float32), 1.0) ** 2
    iso = 9.0 / r2
    return Projections(
        means2d=proj.means2d, depths=proj.depths, radii=proj.radii,
        conics=jnp.stack([iso, jnp.zeros_like(iso), iso], axis=-1),
        compensations=jnp.ones((cap,), jnp.float32), mask=proj.mask)


def _xla(proj, op, ch):
    shim = _shim(proj, op.shape[0])
    isects = isect_encode(shim, H, W, TS, 8192)
    res = rasterize_surfels(proj, op, ch, isects, H, W, tile_size=TS,
                            max_per_tile=512, chunk=64)
    return res


def _pallas(proj, op, ch):
    shim = _shim(proj, op.shape[0])
    isects = isect_encode_padded(shim, H, W, TS, capacity=8192)
    return rasterize_surfels_pallas(
        proj.Tu, proj.Tv, proj.Tw, proj.zcoef, op, ch, isects, H, W, TS,
        128, True, 8192)


def test_surfel_pallas_forward_parity():
    proj, op, ch = _scene()
    res = _xla(proj, op, ch)
    img, alpha, expd, med, dist = _pallas(proj, op, ch)
    np.testing.assert_allclose(np.asarray(img), np.asarray(res.channels),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(res.alpha),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(expd),
                               np.asarray(res.exp_depth), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(med),
                               np.asarray(res.median_depth), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dist),
                               np.asarray(res.distortion), rtol=2e-4,
                               atol=2e-5)


def test_surfel_pallas_gradient_parity():
    proj, op, ch = _scene(n=40, seed=5)
    rng = np.random.RandomState(1)
    w_img = jnp.asarray(rng.rand(H, W, 6), jnp.float32)
    w_a = jnp.asarray(rng.rand(H, W), jnp.float32)
    w_d = jnp.asarray(rng.rand(H, W), jnp.float32) * 0.1
    w_dist = jnp.asarray(rng.rand(H, W), jnp.float32) * 0.1

    def loss_xla(Tu, Tv, Tw, zc, o, c):
        p = proj._replace(Tu=Tu, Tv=Tv, Tw=Tw, zcoef=zc)
        res = _xla(p, o, c)
        return (jnp.sum(res.channels * w_img) + jnp.sum(res.alpha * w_a)
                + jnp.sum(res.exp_depth * w_d)
                + jnp.sum(res.distortion * w_dist))

    def loss_pl(Tu, Tv, Tw, zc, o, c):
        p = proj._replace(Tu=Tu, Tv=Tv, Tw=Tw, zcoef=zc)
        img, alpha, expd, med, dist = _pallas(p, o, c)
        return (jnp.sum(img * w_img) + jnp.sum(alpha * w_a)
                + jnp.sum(expd * w_d) + jnp.sum(dist * w_dist))

    args = (proj.Tu, proj.Tv, proj.Tw, proj.zcoef, op, ch)
    gx = jax.grad(loss_xla, argnums=tuple(range(6)))(*args)
    gp = jax.grad(loss_pl, argnums=tuple(range(6)))(*args)
    names = ["Tu", "Tv", "Tw", "zcoef", "op", "ch"]
    for name, a, b in zip(names, gx, gp):
        denom = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(b) / denom, np.asarray(a) / denom, atol=3e-3,
            err_msg=f"gradient mismatch for {name}")


def test_surfel_pallas_empty_scene():
    proj, op, ch = _scene(n=8, seed=2)
    proj = proj._replace(radii=jnp.zeros_like(proj.radii),
                         mask=jnp.zeros_like(proj.mask))
    img, alpha, expd, med, dist = _pallas(proj, op, ch)
    assert float(jnp.abs(img).max()) == 0.0
    assert float(jnp.abs(alpha).max()) == 0.0


def test_surfel_renderer_pallas_backend():
    """SurfelRenderer with backend='pallas' matches the XLA backend
    end-to-end (render/alpha/normals/dist/surf_depth) and trains one
    step."""
    import sys
    sys.path.insert(0, "tests")
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.gaussian_2d import Gaussian2DConfig
    from gsl_tpu.renderers.surfel_renderer import SurfelRendererConfig

    rng = np.random.RandomState(3)
    model = Gaussian2DConfig(sh_degree=1)
    gaussians = model.init_from_pcd(
        rng.rand(80, 3).astype(np.float32) * 2 - 1,
        rng.rand(80, 3).astype(np.float32), 128)
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=50.,
                      fy=50., cx=W / 2, cy=H / 2, width=W, height=H)
    bg = jnp.zeros(3, jnp.float32)

    out_x = SurfelRendererConfig(backend="xla").instantiate().forward(
        gaussians, cam, H, W, bg, 1)
    out_p = SurfelRendererConfig(backend="pallas").instantiate().forward(
        gaussians, cam, H, W, bg, 1)
    for key in ("render", "alpha", "rend_normal", "rend_dist",
                "surf_depth"):
        a = np.asarray(getattr(out_x, key))
        b = np.asarray(getattr(out_p, key))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4,
                                   err_msg=f"mismatch in {key}")



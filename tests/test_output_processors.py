"""Bilateral grid / exposure output processor tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.training.output_processors import (
    BilateralGridConfig, ExposureConfig, apply_exposure,
    bilateral_grid_tv_loss, init_bilateral_grids, init_exposures,
    slice_bilateral_grid)


def test_identity_grid_is_identity():
    cfg = BilateralGridConfig(n_images=2)
    grids = init_bilateral_grids(cfg)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (24, 32, 3)).astype(np.float32))
    out = slice_bilateral_grid(grids[0], rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)
    assert float(bilateral_grid_tv_loss(grids)) == 0.0


def test_grid_gradients_flow():
    cfg = BilateralGridConfig(n_images=1)
    grids = init_bilateral_grids(cfg)
    rgb = jnp.full((16, 16, 3), 0.5)
    target = jnp.full((16, 16, 3), 0.8)

    def loss(g):
        out = slice_bilateral_grid(g[0], rgb)
        return jnp.mean((out - target) ** 2) \
            + 10.0 * bilateral_grid_tv_loss(g)

    g = jax.grad(loss)(grids)
    assert float(jnp.abs(g).max()) > 0
    # a few SGD steps reduce the loss
    cur = grids
    l0 = float(loss(cur))
    for _ in range(20):
        cur = cur - 0.5 * jax.grad(loss)(cur)
    assert float(loss(cur)) < l0


def test_exposure_identity_and_apply():
    cfg = ExposureConfig(n_images=3)
    ex = init_exposures(cfg)
    rgb = jnp.asarray(np.random.RandomState(1).uniform(
        0, 1, (8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(apply_exposure(ex[0], rgb)),
                               np.asarray(rgb), atol=1e-6)
    ex2 = ex.at[1, 0, 0].set(2.0)
    out = apply_exposure(ex2[1], rgb)
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(rgb[..., 0]) * 2.0, atol=1e-6)

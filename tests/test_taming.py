"""Taming 3DGS budgeted densification tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import (GaussianState, OptimizationConfig,
                                     VanillaGaussianConfig)
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.density import init_density_state
from gsl_tpu.training.optimizers import build_gaussian_optimizer
from gsl_tpu.training.taming import (Taming3DGSDensityControllerConfig,
                                     compute_gaussian_scores,
                                     get_count_array, get_edges,
                                     taming_densify)

from scene_utils import random_scene, simple_camera

W, H = 64, 48


def test_count_array_curve():
    arr = get_count_array(1000, 3.0, densify_until_iter=15000,
                          densify_from_iter=500,
                          densification_interval=500)
    assert arr[0] == 1000
    assert arr[-1] <= 3000
    assert all(b >= a for a, b in zip(arr, arr[1:]))  # monotone
    arr2 = get_count_array(1000, 5000, 15000, 500, 500, mode="final_count")
    assert arr2[-1] <= 5000


def test_edges():
    img = jnp.zeros((32, 32, 3)).at[:, 16:].set(1.0)
    e = np.asarray(get_edges(img))
    assert e.shape == (32, 32)
    assert e[16, 16] > e[16, 4]  # edge at the boundary


def _setup():
    means, scales, quats, opac, colors = random_scene(120, 3)
    cfg = VanillaGaussianConfig(sh_degree=0)
    state = cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                              capacity=256)
    return state


def test_scores_and_budgeted_densify():
    state = _setup()
    renderer = TileRendererConfig(max_per_tile=256, chunk=32,
                                  min_isect_capacity=4096).instantiate()
    cam = simple_camera(W, H)
    gt = jnp.full((H, W, 3), 0.4, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    cfg = Taming3DGSDensityControllerConfig()

    grads = jnp.ones((256,), jnp.float32) * 1e-3
    scores = compute_gaussian_scores(
        renderer, state, [cam], [gt], grads, bg, 0, cfg.score_coeffs)
    assert scores.shape == (256,)
    assert np.isfinite(np.asarray(scores)).all()
    assert float(scores.max()) > 0
    # dead slots get zero score
    assert np.all(np.asarray(scores)[~np.asarray(state.alive)] == 0)

    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt_state = tx.init(state.params)
    dstate = init_density_state(256).replace(
        grad_accum=jnp.full((256,), 1.0), denom=jnp.ones((256,)))

    budget = 140  # only 20 new allowed
    new_state, *_ = taming_densify(
        jax.random.PRNGKey(0), state, opt_state, dstate, cfg, scores,
        budget, 1.0, 100.0, jnp.asarray(False))
    n_after = int(new_state.n_alive)
    assert 120 <= n_after <= budget + 1, n_after

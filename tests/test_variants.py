"""Variant algorithm tests: MCMC relocation/growth/noise, Mip-Splatting
3D filter."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import (GaussianState, VanillaGaussianConfig,
                                     OptimizationConfig, inverse_sigmoid)
from gsl_tpu.models.mip_splatting import (apply_3d_filter, compute_3d_filter)
from gsl_tpu.renderers.mip_splatting_renderer import MipSplattingRendererConfig
from gsl_tpu.training.mcmc import (MCMCDensityControllerConfig, mcmc_densify,
                                   mcmc_noise_step, relocation_correction)
from gsl_tpu.training.optimizers import build_gaussian_optimizer
from gsl_tpu.data.cameras import make_camera, stack_cameras

from scene_utils import random_scene, simple_camera


def _state(n=50, cap=128, seed=0):
    rng = np.random.RandomState(seed)
    cfg = VanillaGaussianConfig(sh_degree=1)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) + [0, 0, 4]
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return cfg, cfg.init_from_pcd(xyz, rgb, capacity=cap)


def test_relocation_identity_for_n1():
    o = jnp.array([0.3, 0.8, 0.05])
    s = jnp.ones((3, 3)) * 0.5
    o_new, s_new = relocation_correction(o, s, jnp.array([1, 1, 1]))
    np.testing.assert_allclose(np.asarray(o_new), np.asarray(o), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_new), np.asarray(s), rtol=1e-4)


def test_relocation_n2_shrinks():
    o = jnp.array([0.9])
    s = jnp.ones((1, 3))
    o_new, s_new = relocation_correction(o, s, jnp.array([2]))
    # 1 - sqrt(1-0.9) ~ 0.6838
    np.testing.assert_allclose(float(o_new[0]), 1 - np.sqrt(0.1), rtol=1e-5)
    assert float(s_new[0, 0]) < 1.0  # split gaussians shrink


def test_mcmc_densify_relocates_and_grows():
    cfg, state = _state(n=50, cap=128)
    # make 5 gaussians dead (opacity below threshold)
    p = state.params.replace(
        opacities=state.params.opacities.at[:5, 0].set(
            inverse_sigmoid(0.001)))
    state = GaussianState(params=p, alive=state.alive)
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt_state = tx.init(state.params)
    mcfg = MCMCDensityControllerConfig(cap_max=100)
    new_state, new_opt, n_new = mcmc_densify(
        jax.random.PRNGKey(0), state, opt_state, mcfg)
    # grown by 2 (5% of 50, floor) up to cap_max
    assert int(n_new) == 2
    assert int(new_state.n_alive) == 52
    # previously-dead slots got healthy opacities from relocation
    op = np.asarray(jax.nn.sigmoid(new_state.params.opacities[:5, 0]))
    assert np.all(op >= 0.005 - 1e-6)


def test_mcmc_noise_moves_alive_only():
    cfg, state = _state(n=50, cap=128)
    new_state = mcmc_noise_step(jax.random.PRNGKey(1), state,
                                means_lr=jnp.asarray(1e-4))
    moved = np.asarray(
        jnp.abs(new_state.params.means - state.params.means).sum(-1))
    assert np.all(moved[:50] > 0)
    assert np.all(moved[50:] == 0)


def test_mip_filter_and_apply():
    cfg, state = _state(n=50, cap=128)
    cams = stack_cameras([simple_camera(64, 48) for _ in range(3)])
    f3d = compute_3d_filter(state.params.means, state.alive, cams)
    assert f3d.shape == (128, 1)
    assert np.all(np.asarray(f3d) > 0)
    op, scales = apply_3d_filter(
        jnp.exp(state.params.scales), jax.nn.sigmoid(
            state.params.opacities[:, 0]), f3d)
    # filtered scales grow, opacities shrink
    assert np.all(np.asarray(scales) >= np.asarray(
        jnp.exp(state.params.scales)) - 1e-7)
    assert np.all(np.asarray(op) <= np.asarray(
        jax.nn.sigmoid(state.params.opacities[:, 0])) + 1e-7)


def test_mip_renderer_forward():
    means, scales, quats, opac, colors = random_scene(100, 0)
    cfg = VanillaGaussianConfig(sh_degree=0)
    state = cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                              capacity=128)
    cam = simple_camera(64, 48)
    cams = stack_cameras([cam])
    f3d = compute_3d_filter(state.params.means, state.alive, cams)
    state = GaussianState(params=state.params, alive=state.alive,
                          extra={"filter_3d": f3d})
    renderer = MipSplattingRendererConfig(
        max_per_tile=256, chunk=32, min_isect_capacity=4096).instantiate()
    out = renderer.forward(state, cam, 48, 64, jnp.zeros(3), sh_degree=0)
    assert out.render.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out.render)).all()

"""Periodic Vibration Gaussian tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.pvg import (PVGConfig, PVGRendererConfig, pvg_modulate)
from gsl_tpu.models.gaussian import GaussianState
from gsl_tpu.training.trainer import Trainer

from scene_utils import random_scene, simple_camera

W, H = 64, 48


def _state():
    means, scales, quats, opac, colors = random_scene(80, 7)
    cfg = PVGConfig(sh_degree=0)
    return cfg, cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                                  capacity=128)


def test_pvg_modulation():
    cfg, state = _state()
    m0, rho0 = pvg_modulate(state, state.params.t_centers[0, 0], 0.2)
    # at t == tau: no displacement, full opacity factor for gaussian 0
    np.testing.assert_allclose(np.asarray(m0[0]),
                               np.asarray(state.params.means[0]), atol=1e-6)
    assert abs(float(rho0[0]) - 1.0) < 1e-6
    # with velocity, means oscillate over time
    p = state.params.replace(
        velocities=state.params.velocities.at[0].set(
            jnp.array([1.0, 0, 0])))
    s2 = GaussianState(params=p, alive=state.alive)
    tau = float(state.params.t_centers[0, 0])
    m_q, _ = pvg_modulate(s2, tau + 0.05, 0.2)  # quarter cycle
    assert abs(float(m_q[0, 0] - state.params.means[0, 0])
               - 0.2 / (2 * np.pi)) < 1e-5


def test_pvg_trainer_step():
    cfg, state = _state()
    trainer = Trainer(model=cfg,
                      renderer=PVGRendererConfig(
                          max_per_tile=128, chunk=32,
                          min_isect_capacity=4096))
    ts = trainer.setup(state, cameras_extent=1.0)
    cam = simple_camera(W, H).replace(time=jnp.asarray(0.5))
    gt = jnp.full((H, W, 3), 0.3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    s1, scalars = trainer.train_step(ts, cam, gt, H, W, 0, bg)
    assert np.isfinite(float(scalars["loss"]))
    # pvg properties receive updates
    assert float(jnp.abs(s1.params.t_centers - ts.params.t_centers).max()) \
        >= 0  # exists and finite
    assert np.isfinite(np.asarray(s1.params.velocities)).all()

"""Gradient-accumulation opt strategy tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.opt_strategies import GradAccConfig, GradAccTrainer

from scene_utils import random_scene, simple_camera

W, H = 64, 48


def test_stage_schedule():
    cfg = GradAccConfig()
    assert cfg.accumulation_at(0) == 1
    assert cfg.accumulation_at(19999) == 1
    assert cfg.accumulation_at(20000) == 5
    assert cfg.accumulation_at(24000) == 20


def test_accumulate_and_apply():
    means, scales, quats, opac, colors = random_scene(100, 4)
    model = VanillaGaussianConfig(sh_degree=0)
    state0 = model.init_from_pcd(np.asarray(means), np.asarray(colors),
                                 capacity=128)
    trainer = GradAccTrainer(
        model=model,
        renderer=TileRendererConfig(max_per_tile=128, chunk=32,
                                    min_isect_capacity=4096))
    state = trainer.setup(state0, cameras_extent=1.0)
    buf = trainer.init_grad_buffer(state)
    cam = simple_camera(W, H)
    gt = jnp.full((H, W, 3), 0.3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    p0 = state.params.means
    # two accumulate-only steps: params unchanged, buffer nonzero
    s, buf, _ = trainer.train_step_accumulate(state, buf, cam, gt, H, W, 0,
                                              bg, apply=False, inv_k=0.5)
    s, buf, _ = trainer.train_step_accumulate(s, buf, cam, gt, H, W, 0,
                                              bg, apply=False, inv_k=0.5)
    np.testing.assert_array_equal(np.asarray(s.params.means),
                                  np.asarray(p0))
    assert float(jnp.abs(buf.means).max()) > 0
    # apply step: params move, buffer cleared
    s, buf, _ = trainer.train_step_accumulate(s, buf, cam, gt, H, W, 0,
                                              bg, apply=True, inv_k=1 / 3)
    assert float(jnp.abs(s.params.means - p0).max()) > 0
    assert float(jnp.abs(buf.means).max()) == 0

"""Loader, viewer renderer, partitioning, and LightGaussian prune tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import GaussianState, VanillaGaussianConfig
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.light_gaussian import (accumulate_blend_weights,
                                             prune_by_importance)
from gsl_tpu.training.optimizers import build_gaussian_optimizer
from gsl_tpu.models.gaussian import OptimizationConfig
from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
from gsl_tpu.utils.partitioning import (PartitionedScene,
                                        auto_hyper_parameter,
                                        build_partitions,
                                        gaussians_in_partition)
from gsl_tpu.utils.ply import save_state_ply
from gsl_tpu.viewer.renderer import ViewerRenderer
from gsl_tpu.viewer.viewer import orbit_c2w

from scene_utils import random_scene, simple_camera


def _state(n=100, cap=128):
    means, scales, quats, opac, colors = random_scene(n, 1)
    cfg = VanillaGaussianConfig(sh_degree=0)
    return cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                             capacity=cap)


def test_loader_from_ply(tmp_path):
    state = _state()
    run = tmp_path / "run" / "point_cloud" / "iteration_30000"
    save_state_ply(str(run / "point_cloud.ply"), state)
    loaded, renderer, sh_degree = GaussianModelLoader.load(
        str(tmp_path / "run"))
    assert int(loaded.n_alive) == 100
    assert sh_degree == 0
    np.testing.assert_allclose(
        np.asarray(loaded.params.means[:100]),
        np.asarray(state.params.means[:100]), rtol=1e-6)


def test_viewer_renderer_orbit(tmp_path):
    state = _state()
    renderer = TileRendererConfig(max_per_tile=256, chunk=32,
                                  min_isect_capacity=4096).instantiate()
    vr = ViewerRenderer(state, renderer, sh_degree=0)
    c2w = orbit_c2w(30.0, -10.0, 6.0,
                    np.asarray(state.params.means[:100]).mean(0))
    img = vr.get_outputs(c2w, 64, 48)
    assert img.shape == (48, 64, 3)
    assert img.dtype == np.uint8
    # depth output path
    vr.output_type = "acc_depth"
    img2 = vr.get_outputs(c2w, 64, 48)
    assert img2.shape == (48, 64, 3)


def test_partitioning(tmp_path):
    rng = np.random.RandomState(0)
    centers = rng.uniform(-10, 10, size=(60, 3))
    points = rng.uniform(-12, 12, size=(500, 3))
    scene = build_partitions(centers, points, n_partitions_hint=4)
    assert len(scene.partitions) >= 2
    # every camera assigned somewhere
    any_mask = np.zeros(60, bool)
    for p in scene.partitions:
        any_mask |= p.camera_mask
    assert any_mask.all()
    path = str(tmp_path / "partitions.npz")
    scene.save(path)
    loaded = PartitionedScene.load(path)
    assert len(loaded.partitions) == len(scene.partitions)
    own = gaussians_in_partition(points, loaded.partitions[0],
                                 loaded.rotation)
    assert own.dtype == bool and own.shape == (500,)


def test_auto_hyper_parameter():
    scaled, up = auto_hyper_parameter(600)
    assert up == 2.0
    assert scaled["densify_until_iter"] == 30000
    scaled1, up1 = auto_hyper_parameter(100)
    assert up1 == 1.0


def test_light_gaussian_prune():
    state = _state()
    cam = simple_camera(64, 48)
    renderer = TileRendererConfig(max_per_tile=256, chunk=32,
                                  min_isect_capacity=4096).instantiate()
    bg = jnp.zeros(3, jnp.float32)

    def render_fn(gstate, camera, bias):
        out = renderer.forward(gstate, camera, 48, 64, bg, 0,
                               rgbs_override=jnp.clip(
                                   gstate.params.shs_dc[:, 0, :] * 0.28
                                   + 0.5, 0, None) + bias[:, None])
        return out.render

    imp = accumulate_blend_weights(render_fn, state, [cam])
    assert imp.shape == (128,)
    assert float(imp.max()) > 0
    assert np.all(np.asarray(imp)[~np.asarray(state.alive)] == 0)

    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt_state = tx.init(state.params)
    new_state, _, n_pruned = prune_by_importance(state, opt_state, imp,
                                                 prune_percent=0.5)
    assert int(n_pruned) == 50
    assert int(new_state.n_alive) == 50
    # survivors are the high-importance half
    kept = np.asarray(new_state.alive[:100])
    imp_np = np.asarray(imp[:100])
    assert imp_np[kept].min() >= np.median(imp_np) - 1e-6

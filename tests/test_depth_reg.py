"""Depth-regularization trainer + estimated-depth parser tests."""
import json
import os

import numpy as np
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.depth_trainer import DepthMetricsConfig, DepthTrainer

from scene_utils import random_scene, simple_camera
from test_dataparsers import _write_synthetic_colmap

W, H = 64, 48


def test_depth_trainer_loss_terms():
    means, scales, quats, opac, colors = random_scene(150, 2)
    model = VanillaGaussianConfig(sh_degree=0)
    state0 = model.init_from_pcd(np.asarray(means), np.asarray(colors),
                                 capacity=256)
    trainer = DepthTrainer(
        model=model,
        renderer=TileRendererConfig(max_per_tile=256, chunk=32,
                                    min_isect_capacity=4096),
        metrics=DepthMetricsConfig(depth_loss_type="l1"),
    )
    state = trainer.setup(state0, cameras_extent=1.0)
    cam = simple_camera(W, H)
    gt = jnp.full((H, W, 3), 0.4, jnp.float32)
    gt_inv_depth = jnp.full((H, W), 0.25, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    s1, scalars = trainer.train_step(state, cam, gt, H, W, 0, bg,
                                     aux_inputs=gt_inv_depth)
    assert "depth_loss" in scalars
    assert np.isfinite(float(scalars["depth_loss"]))
    assert float(scalars["depth_loss"]) > 0
    # without aux input the depth term is skipped
    s2, scalars2 = trainer.train_step(state, cam, gt, H, W, 0, bg)
    assert "depth_loss" not in scalars2


def test_estimated_depth_parser(tmp_path):
    from gsl_tpu.data.dataparsers.estimated_depth_colmap import (
        EstimatedDepthColmapDataParserConfig, load_depth)

    _write_synthetic_colmap(str(tmp_path))
    ddir = tmp_path / "estimated_depths"
    os.makedirs(ddir)
    scales = {}
    for i in range(10):
        name = f"img_{i:03d}"
        np.save(ddir / f"{name}.npy",
                np.full((48, 64), 0.5, np.float32))
        scales[name + ".png"] = {"scale": 2.0 if i < 8 else 100.0,
                                 "offset": 0.1}
    with open(tmp_path / "estimated_depth_scales.json", "w") as f:
        json.dump(scales, f)

    cfg = EstimatedDepthColmapDataParserConfig(path=str(tmp_path))
    out = cfg.instantiate().get_outputs()
    depth_info = out.train_set.extra_data["depth"]
    assert len(depth_info) == 10
    # outlier-scale images (100x median) dropped from supervision
    n_valid = sum(1 for e in depth_info if e is not None)
    assert n_valid == 8
    d = load_depth(next(e for e in depth_info if e is not None))
    np.testing.assert_allclose(d, 0.5 * 2.0 + 0.1)

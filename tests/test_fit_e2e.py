"""Full end-to-end: synthesize a tiny Blender-style dataset from a known
gaussian scene, run `fit` through the CLI component stack, check PSNR."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gsl_tpu.cli import build_components
from gsl_tpu.models.gaussian import GaussianState, VanillaGaussianConfig, \
    inverse_sigmoid
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.fit import fit, FitConfig

from scene_utils import random_scene

W = H = 64


def _make_dataset(root, n_views=6):
    """Render a known gaussian scene to PNGs + transforms_train.json."""
    from PIL import Image

    means, scales, quats, opac, colors = random_scene(200, seed=9,
                                                      spread=0.8)
    cfg = VanillaGaussianConfig(sh_degree=0)
    state = cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                              capacity=256)
    params = state.params.replace(
        scales=state.params.scales.at[:200].set(jnp.log(scales)),
        opacities=state.params.opacities.at[:200, 0].set(
            inverse_sigmoid(opac)),
        rotations=state.params.rotations.at[:200].set(quats))
    state = GaussianState(params=params, alive=state.alive)
    renderer = TileRendererConfig(max_per_tile=256, chunk=32,
                                  min_isect_capacity=8192).instantiate()

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    fov_x = 0.8
    f = 0.5 * W / np.tan(0.5 * fov_x)
    from gsl_tpu.data.cameras import make_camera
    bg = jnp.zeros(3, jnp.float32)
    for i in range(n_views):
        # camera at origin shifted along x, looking +z (OpenCV);
        # to express in blender json: c2w with y/z flipped back
        T = np.array([0.25 * i - 0.6, 0.0, 0.0], np.float32)
        cam = make_camera(np.eye(3), T, f, f, W / 2, H / 2, W, H)
        out = renderer.forward(state, cam, H, W, bg, sh_degree=0)
        img = (np.clip(np.asarray(out.render), 0, 1) * 255).astype(np.uint8)
        name = f"train/r_{i}"
        Image.fromarray(img).save(os.path.join(root, name + ".png"))
        # w2c = [R|T] with R=I -> c2w_opencv = [I | -T]
        c2w = np.eye(4)
        c2w[:3, 3] = -T
        c2w[:3, 1:3] *= -1  # opencv -> opengl (the parser will flip back)
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": fov_x, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as fjs:
        json.dump(meta, fjs)


@pytest.mark.slow
def test_fit_e2e_blender_style(tmp_path):
    _make_dataset(str(tmp_path))
    cfg = {
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": str(tmp_path),
                                          "random_point_count": 800,
                                          "white_background": False}}},
        "model": {
            "gaussian": {"sh_degree": 0},
            "renderer": {"init_args": {"max_per_tile": 256, "chunk": 32,
                                       "min_isect_capacity": 8192}},
            "density": {"init_args": {"densify_from_iter": 50,
                                      "densification_interval": 50,
                                      "opacity_reset_interval": 10000}},
        },
        "trainer": {"max_steps": 300},
        "fit": {"max_steps": 300, "output_dir": str(tmp_path / "out"),
                "min_capacity": 4096, "log_interval": 50,
                "save_iterations": [300]},
    }
    trainer, dataparser_cfg, fit_cfg = build_components(cfg)
    outputs = dataparser_cfg.instantiate().get_outputs()
    # use train set as val for the check
    outputs.val_set.image_names[:] = outputs.train_set.image_names
    state, results = fit(trainer, outputs, fit_cfg)
    assert results is not None
    # 300 steps from random points on an easy synthetic scene (starts ~9 dB)
    assert results["psnr"] > 13.0, results
    # artifacts exist
    assert os.path.isfile(os.path.join(
        str(tmp_path / "out"), "point_cloud", "iteration_300",
        "point_cloud.ply"))
    assert os.path.isfile(os.path.join(str(tmp_path / "out"), "metrics",
                                       "val.csv"))


def test_tensorboard_logger_images(tmp_path):
    """logger=tensorboard: scalars land in tb/ event files and validation
    panels are logged (reference --logger, internal/cli.py:112-134)."""
    import pytest
    pytest.importorskip("torch.utils.tensorboard")
    _make_dataset(str(tmp_path), n_views=4)
    cfg = {
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": str(tmp_path),
                                          "random_point_count": 300,
                                          "white_background": False}}},
        "model": {
            "gaussian": {"sh_degree": 0},
            "renderer": {"init_args": {"max_per_tile": 256, "chunk": 32,
                                       "min_isect_capacity": 8192}},
            "density": {"init_args": {"densify_from_iter": 10000}},
        },
        "trainer": {"max_steps": 6},
        "fit": {"max_steps": 6, "output_dir": str(tmp_path / "out"),
                "min_capacity": 1024, "save_iterations": [],
                "save_ply": False, "resume": "never"},
    }
    trainer, dataparser_cfg, fit_cfg = build_components(cfg)
    fit_cfg.logger = "tensorboard"
    fit_cfg.log_interval = 2
    fit_cfg.log_val_images = 1
    outputs = dataparser_cfg.instantiate().get_outputs()
    outputs.val_set.image_names[:] = outputs.train_set.image_names
    state, results = fit(trainer, outputs, fit_cfg, val_at_end=True)
    tb_dir = os.path.join(str(tmp_path / "out"), "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
    sz = sum(os.path.getsize(os.path.join(tb_dir, f))
             for f in os.listdir(tb_dir))
    # an image summary makes the event file far larger than scalars alone
    assert sz > 2000, sz

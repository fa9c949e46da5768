"""SiLVR dataparser + the generic plugin seams."""
import json
import os

import numpy as np
import jax.numpy as jnp


def test_silvr_parser(tmp_path):
    from PIL import Image
    from gsl_tpu.data.dataparsers.silvr import SILVRDataParserConfig

    frames = []
    for i in range(4):
        name = f"img_{i}.png"
        Image.new("RGB", (32, 24), (i * 30, 100, 100)).save(
            str(tmp_path / name))
        c2w = np.eye(4)
        c2w[:3, 3] = [np.sin(i), 0.2, np.cos(i)]
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist(),
                       "w": 32, "h": 24, "fl_x": 40.0, "fl_y": 40.0,
                       "cx": 16.0, "cy": 12.0})
    with open(str(tmp_path / "transforms.json"), "w") as f:
        json.dump({"frames": frames}, f)

    out = SILVRDataParserConfig(path=str(tmp_path),
                                n_random_points=500).instantiate(
                                ).get_outputs()
    assert len(out.train_set) == 4
    assert len(out.val_set) == 1        # first frame doubles as val
    assert out.point_cloud.xyz.shape == (500, 3)
    # points centered on the camera cloud
    centers = np.stack([np.asarray(out.train_set.cameras[i].camera_center)
                        for i in range(4)])
    assert np.linalg.norm(out.point_cloud.xyz.mean(0)
                          - centers.mean(0)) < 1.0


def test_background_removal_plugin_loss(tmp_path):
    """Plugin extra_loss runs inside the jitted step and moves the loss
    (reference plugins/background_removal.py)."""
    import sys
    sys.path.insert(0, "tests")
    from scene_utils import random_scene
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.gaussian import VanillaGaussianConfig
    from gsl_tpu.renderers.tile_renderer import TileRendererConfig
    from gsl_tpu.training.density import VanillaDensityControllerConfig
    from gsl_tpu.training.plugins import BackgroundRemovalPluginConfig
    from gsl_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.RandomState(0)
    model = VanillaGaussianConfig(sh_degree=0)
    gaussians = model.init_from_pcd(
        rng.rand(150, 3).astype(np.float32) * 2 - 1,
        rng.rand(150, 3).astype(np.float32), 256)

    plugin = BackgroundRemovalPluginConfig(
        background_removal_from=0).instantiate()
    trainer = Trainer(
        model=model,
        renderer=TileRendererConfig(min_isect_capacity=4096,
                                    max_per_tile=256, chunk=32),
        density=VanillaDensityControllerConfig(),
        config=TrainerConfig(), plugins=(plugin,))
    state = trainer.setup(gaussians, 1.0, 1.0)
    H = W = 32
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=40.,
                      fy=40., cx=16., cy=16., width=W, height=H)
    gt = jnp.full((H, W, 3), 0.5, jnp.float32)
    mask = jnp.zeros((H, W), jnp.float32)  # everything background
    s2, scalars = trainer.train_step(state, cam, gt, H, W, 0,
                                     jnp.zeros(3, jnp.float32), mask=mask)
    assert "bkg_removal" in scalars
    assert float(scalars["bkg_removal"]) >= 0.0
    assert np.isfinite(float(scalars["loss"]))

"""Normal-reg + ground-reg metric plugins (reference
internal/metrics/normal_reg.py, internal/metrics/ground_reg_metrics.py)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")

from gsl_tpu.data.cameras import make_camera
from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.ops.transforms import depth_to_normal
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.density import VanillaDensityControllerConfig
from gsl_tpu.training.plugins import (GroundRegPluginConfig,
                                      NormalRegPluginConfig)
from gsl_tpu.training.trainer import Trainer, TrainerConfig


def _camera(H=32, W=32):
    return make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=40.,
                       fy=40., cx=W / 2, cy=H / 2, width=W, height=H)


def test_depth_to_normal_frontal_plane():
    """A constant-depth plane faces the camera: normal = -z axis rotated
    to world (identity here), up to sign convention, and is unit-norm."""
    cam = _camera()
    depth = jnp.full((32, 32), 2.0, jnp.float32)
    n = depth_to_normal(depth, cam.world_to_camera, cam.fx, cam.fy,
                        cam.cx, cam.cy)
    inner = np.asarray(n[1:-1, 1:-1])
    norms = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # all normals parallel to +-z
    assert np.abs(inner[..., 2]).min() > 0.999
    # border is zero
    assert float(jnp.abs(n[0]).max()) == 0.0


def test_depth_to_normal_tilted_plane():
    """Depth increasing along +x produces a normal tilted in the x-z
    plane, constant across the plane."""
    cam = _camera()
    xs = jnp.arange(32, dtype=jnp.float32)
    depth = jnp.broadcast_to(2.0 + 0.02 * xs[None, :], (32, 32))
    n = np.asarray(depth_to_normal(depth, cam.world_to_camera, cam.fx,
                                   cam.fy, cam.cx, cam.cy))
    inner = n[5:-5, 5:-5]
    assert np.abs(inner[..., 0]).mean() > 1e-3       # x component present
    assert inner.std(axis=(0, 1)).max() < 0.05       # near-constant


def _trainer(plugins):
    rng = np.random.RandomState(0)
    model = VanillaGaussianConfig(sh_degree=0)
    gaussians = model.init_from_pcd(
        rng.rand(150, 3).astype(np.float32) * 2 - 1,
        rng.rand(150, 3).astype(np.float32), 256)
    trainer = Trainer(
        model=model,
        renderer=TileRendererConfig(min_isect_capacity=4096,
                                    max_per_tile=256, chunk=32),
        density=VanillaDensityControllerConfig(),
        config=TrainerConfig(), plugins=plugins)
    return trainer, gaussians


def test_normal_reg_plugin_train_step():
    plugin = NormalRegPluginConfig().instantiate()
    trainer, gaussians = _trainer((plugin,))
    state = trainer.setup(gaussians, 1.0, 1.0)
    # setup hook randomized rotations + flattened the last scale axis
    assert float(jnp.abs(state.params.scales[..., -1]
                         - gaussians.params.scales[..., -1]).max()) > 0.1
    H = W = 32
    cam = _camera()
    gt = jnp.full((H, W, 3), 0.5, jnp.float32)
    s2, scalars = trainer.train_step(state, cam, gt, H, W, 0,
                                     jnp.zeros(3, jnp.float32))
    assert "normal_loss" in scalars and "flatten_loss" in scalars
    assert np.isfinite(float(scalars["loss"]))
    assert float(scalars["flatten_loss"]) > 0.0
    # params actually moved
    assert float(jnp.abs(s2.params.means - state.params.means).max()) > 0


def test_ground_reg_plugin():
    plugin = GroundRegPluginConfig(up_direction=(0., 0., 1.),
                                   ground_alt=0.0,
                                   ground_reg_interval=1).instantiate()
    trainer, gaussians = _trainer((plugin,))
    state = trainer.setup(gaussians, 1.0, 1.0)
    # setup projected below-ground points (z < 0) up to the plane
    z = np.asarray(state.params.means[:, 2])[np.asarray(state.alive)]
    assert z.min() >= -1e-5
    H = W = 32
    cam = _camera()
    gt = jnp.full((H, W, 3), 0.5, jnp.float32)
    s2, scalars = trainer.train_step(state, cam, gt, H, W, 0,
                                     jnp.zeros(3, jnp.float32))
    assert "ground" in scalars
    assert np.isfinite(float(scalars["loss"]))
    # after an optimizer step some gaussians may dip below ground; the
    # reg term then becomes positive on the next step
    s3, scalars3 = trainer.train_step(s2, cam, gt, H, W, 0,
                                      jnp.zeros(3, jnp.float32))
    assert float(scalars3["ground"]) >= 0.0


def test_normal_render_type():
    """The main renderer's normal channel blends unit-ish world normals."""
    trainer, gaussians = _trainer(())
    state = trainer.setup(gaussians, 1.0, 1.0)
    cam = _camera()
    out = trainer.renderer.forward(
        state.gaussians, cam, 32, 32, jnp.zeros(3, jnp.float32), 0,
        render_types=frozenset({"rgb", "normal", "alpha"}))
    assert out.normal.shape == (32, 32, 3)
    n = np.asarray(out.normal)
    a = np.asarray(out.alpha)
    assert np.isfinite(n).all()
    # where alpha is high the blended normal has nonzero magnitude
    hit = a > 0.5
    if hit.any():
        assert np.linalg.norm(n[hit], axis=-1).mean() > 0.1

"""2DGS surfel projection/rasterization: analytic cases + autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import GaussianState, inverse_sigmoid
from gsl_tpu.models.gaussian_2d import Gaussian2DConfig
from gsl_tpu.ops.projection import Projections
from gsl_tpu.ops.surfel import project_surfels, rasterize_surfels
from gsl_tpu.ops.tiling import isect_encode
from gsl_tpu.renderers.surfel_renderer import (SurfelRendererConfig,
                                               depth_to_normal)
from gsl_tpu.training.gs2d import GS2DTrainer, GS2DMetricsConfig

from scene_utils import simple_camera

W, H = 64, 48


def _single_surfel(z=4.0, s=0.5, op=0.8):
    cam = simple_camera(W, H, f=70.0)
    means = jnp.array([[0.0, 0.0, z]])
    scales = jnp.array([[s, s]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])  # axes = world xyz
    proj = project_surfels(means, scales, quats, cam.world_to_camera,
                           cam.fx, cam.fy, cam.cx, cam.cy, W, H)
    return cam, proj, jnp.array([op])


def _raster(proj, op, colors, max_per_tile=64):
    shim = Projections(
        means2d=proj.means2d, depths=proj.depths, radii=proj.radii,
        conics=jnp.zeros((proj.means2d.shape[0], 3), jnp.float32),
        compensations=jnp.ones((proj.means2d.shape[0],), jnp.float32),
        mask=proj.mask)
    isects = isect_encode(shim, H, W, 16, capacity=4096)
    return rasterize_surfels(proj, op, colors, isects, H, W,
                             tile_size=16, max_per_tile=max_per_tile,
                             chunk=32)


def test_single_surfel_center_values():
    cam, proj, op = _single_surfel()
    assert bool(proj.mask[0])
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32.0, 24.0],
                               atol=1e-4)
    colors = jnp.array([[1.0, 0.5, 0.25]])
    res = _raster(proj, op, colors)
    cy, cx = 24, 32
    # center pixel: u=v=0 -> G=1 -> alpha=opacity (approx; pixel offset 0.5)
    assert abs(float(res.alpha[cy, cx]) - 0.8) < 0.02
    np.testing.assert_allclose(
        np.asarray(res.channels[cy, cx]) / float(res.alpha[cy, cx]),
        [1.0, 0.5, 0.25], rtol=1e-3)
    # expected depth at center ~ z * alpha
    assert abs(float(res.exp_depth[cy, cx]) / float(res.alpha[cy, cx])
               - 4.0) < 1e-3
    # alpha > 0.5 -> median records the surfel depth
    assert abs(float(res.median_depth[cy, cx]) - 4.0) < 1e-3
    # distortion of a single surfel is zero
    assert abs(float(res.distortion[cy, cx])) < 1e-6


def test_tilted_surfel_depth_varies():
    cam = simple_camera(W, H, f=70.0)
    means = jnp.array([[0.0, 0.0, 4.0]])
    scales = jnp.array([[1.0, 1.0]])
    # rotate 45 deg about y: normal tilts, depth varies along x
    th = np.pi / 4
    quats = jnp.array([[np.cos(th / 2), 0.0, np.sin(th / 2), 0.0]],
                      jnp.float32)
    proj = project_surfels(means, scales, quats, cam.world_to_camera,
                           cam.fx, cam.fy, cam.cx, cam.cy, W, H)
    res = _raster(proj, jnp.array([0.9]), jnp.array([[1.0, 1.0, 1.0]]))
    cy = 24
    d = np.asarray(res.exp_depth[cy]) / np.maximum(
        np.asarray(res.alpha[cy]), 1e-8)
    vis = np.asarray(res.alpha[cy]) > 0.3
    xs = np.nonzero(vis)[0]
    assert len(xs) > 4
    # depth should increase monotonically along +x for this tilt
    dd = np.diff(d[xs])
    assert np.all(dd > 0) or np.all(dd < 0)


def test_two_surfels_distortion_positive():
    cam = simple_camera(W, H, f=70.0)
    means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 5.0]])
    scales = jnp.full((2, 2), 0.5)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    proj = project_surfels(means, scales, quats, cam.world_to_camera,
                           cam.fx, cam.fy, cam.cx, cam.cy, W, H)
    res = _raster(proj, jnp.array([0.5, 0.5]),
                  jnp.ones((2, 3), jnp.float32))
    assert float(res.distortion[24, 32]) > 1e-6


def test_surfel_gradients_finite():
    cam, proj0, op = _single_surfel()
    means = jnp.array([[0.1, -0.05, 4.0]])
    scales = jnp.array([[0.4, 0.6]])
    quats = jnp.array([[0.9, 0.1, 0.2, 0.0]])

    def loss(means, scales, quats, op):
        proj = project_surfels(means, scales, quats, cam.world_to_camera,
                               cam.fx, cam.fy, cam.cx, cam.cy, W, H)
        res = _raster(proj, op, jnp.ones((1, 3), jnp.float32))
        return (jnp.sum(res.channels ** 2) + jnp.sum(res.distortion)
                + jnp.sum(res.exp_depth) * 0.01)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        means, scales, quats, jnp.array([0.7]))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_gs2d_trainer_step():
    rng = np.random.RandomState(3)
    xyz = np.concatenate([rng.uniform(-0.8, 0.8, (100, 2)),
                          rng.uniform(2.5, 5, (100, 1))],
                         axis=1).astype(np.float32)
    rgb = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    model = Gaussian2DConfig(sh_degree=0)
    state0 = model.init_from_pcd(xyz, rgb, capacity=128)
    assert state0.params.scales.shape == (128, 2)

    from gsl_tpu.renderers.surfel_renderer import SurfelRendererConfig
    trainer = GS2DTrainer(
        model=model,
        metrics=GS2DMetricsConfig(lambda_dist=100.0, normal_from_iter=0,
                                  dist_from_iter=0),
    )
    trainer.renderer_cfg = SurfelRendererConfig(
        max_per_tile=128, chunk=32, min_isect_capacity=4096)
    trainer.renderer = trainer.renderer_cfg.instantiate()
    state = trainer.setup(state0, cameras_extent=1.0)

    cam = simple_camera(W, H)
    # black target on black bg: training must push splat opacity down,
    # monotonically shrinking the rgb loss
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    s1, scalars = trainer.train_step(state, cam, gt, H, W, 0, bg)
    assert np.isfinite(float(scalars["loss"]))
    assert float(scalars["rgb_diff"]) > 1e-4  # something rendered
    s = s1
    for _ in range(15):
        s, scalars2 = trainer.train_step(s, cam, gt, H, W, 0, bg)
    assert np.isfinite(float(scalars2["loss"]))
    assert float(scalars2["rgb_diff"]) < float(scalars["rgb_diff"])
    # PARAMS must stay finite, not just the loss: the round-5 quality run
    # went loss-finite/params-NaN through the normal-consistency term
    # (depth_to_normal's unsafe normalize — see NOTES_ROUND5)
    for k in ("means", "scales", "rotations", "opacities", "shs_dc"):
        assert np.isfinite(np.asarray(getattr(s.params, k))).all(), k


def test_depth_to_normal_grad_finite_on_flat_depth():
    """cross(dx, dy) == 0 on flat/empty depth regions; the normalize VJP
    must stay finite there (pre-fix: 0/0 NaN poisoning every upstream
    gradient through the rasterizer reduce)."""
    from gsl_tpu.renderers.surfel_renderer import depth_to_normal
    cam = simple_camera(W, H)
    # flat zero depth = the empty-background case of the quality run
    for base in (0.0, 3.0):
        depth = jnp.full((H, W), base, jnp.float32)
        g = jax.grad(
            lambda d: jnp.sum(depth_to_normal(cam, d) ** 2))(depth)
        assert np.isfinite(np.asarray(g)).all(), base

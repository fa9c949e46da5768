"""Tile rasterizer vs naive oracle: forward images and input gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsl_tpu.ops.projection import project_gaussians, tile_rect
from gsl_tpu.ops.tiling import isect_encode
from gsl_tpu.ops.rasterize_reference import rasterize_oracle
from gsl_tpu.ops.rasterize_jax import rasterize_tiles

from scene_utils import random_scene, simple_camera

W, H, TS = 64, 48, 16


def _project(means, scales, quats, cam):
    return project_gaussians(
        means, scales, quats, cam.world_to_camera,
        cam.fx, cam.fy, cam.cx, cam.cy, W, H)


@pytest.mark.parametrize("n,seed", [(300, 0), (1000, 1), (50, 2)])
def test_forward_matches_oracle(n, seed):
    means, scales, quats, opac, colors = random_scene(n, seed)
    cam = simple_camera(W, H)
    proj = _project(means, scales, quats, cam)

    tiles_x, tiles_y = -(-W // TS), -(-H // TS)
    rmin, rmax = tile_rect(proj, TS, tiles_x, tiles_y)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)

    img_o, alpha_o = rasterize_oracle(
        proj.means2d, proj.conics, opac, colors, proj.depths, proj.mask,
        H, W, background=bg, tile_rect_min=rmin, tile_rect_max=rmax,
        tile_size=TS)

    isects = isect_encode(proj, H, W, TS, capacity=8192)
    assert int(isects.n_dropped) == 0
    img_t, alpha_t = rasterize_tiles(
        proj.means2d, proj.conics, opac, colors, isects, H, W,
        tile_size=TS, max_per_tile=1024, chunk=64, background=bg)

    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_t), np.asarray(alpha_o),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_oracle():
    n, seed = 400, 3
    means, scales, quats, opac, colors = random_scene(n, seed)
    cam = simple_camera(W, H)
    proj = _project(means, scales, quats, cam)
    tiles_x, tiles_y = -(-W // TS), -(-H // TS)
    rmin, rmax = tile_rect(proj, TS, tiles_x, tiles_y)
    bg = jnp.zeros(3, jnp.float32)
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (H, W, 3))

    def loss_oracle(means2d, conics, op, col):
        img, _ = rasterize_oracle(
            means2d, conics, op, col, proj.depths, proj.mask, H, W,
            background=bg, tile_rect_min=rmin, tile_rect_max=rmax,
            tile_size=TS)
        return jnp.sum((img - target) ** 2)

    isects = isect_encode(proj, H, W, TS, capacity=8192)

    def loss_tiles(means2d, conics, op, col):
        img, _ = rasterize_tiles(
            means2d, conics, op, col, isects, H, W, tile_size=TS,
            max_per_tile=1024, chunk=64, background=bg)
        return jnp.sum((img - target) ** 2)

    args = (proj.means2d, proj.conics, opac, colors)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(*args)
    g_t = jax.grad(loss_tiles, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_o, g_t, ["means2d", "conics", "opac", "colors"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=f"grad mismatch: {name}")


def test_extra_channels_depth():
    """Compositing arbitrary channels (depth) matches oracle."""
    n = 200
    means, scales, quats, opac, colors = random_scene(n, 5)
    cam = simple_camera(W, H)
    proj = _project(means, scales, quats, cam)
    ch = jnp.concatenate([colors, proj.depths[:, None]], axis=-1)
    tiles_x, tiles_y = -(-W // TS), -(-H // TS)
    rmin, rmax = tile_rect(proj, TS, tiles_x, tiles_y)
    bg = jnp.zeros(4, jnp.float32)

    img_o, _ = rasterize_oracle(
        proj.means2d, proj.conics, opac, ch, proj.depths, proj.mask,
        H, W, background=bg, tile_rect_min=rmin, tile_rect_max=rmax,
        tile_size=TS)
    isects = isect_encode(proj, H, W, TS, capacity=8192)
    img_t, _ = rasterize_tiles(
        proj.means2d, proj.conics, opac, ch, isects, H, W,
        tile_size=TS, max_per_tile=1024, chunk=32, background=bg)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o),
                               rtol=1e-4, atol=1e-5)

"""SH-preserving rigid transforms: rendering a rotated scene with the
correspondingly rotated camera must reproduce the original image."""
import numpy as np
import jax.numpy as jnp
import pytest

from gsl_tpu.models.gaussian import GaussianState, VanillaGaussianConfig
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.utils.gaussian_transforms import (rotate_state, scale_state,
                                               sh_rotation_matrices,
                                               translate_state)

from scene_utils import random_scene, simple_camera

W, H = 64, 48


def _rot(axis, deg):
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


def test_sh_rotation_matrices_orthonormal():
    R = _rot("y", 33) @ _rot("x", 12)
    mats = sh_rotation_matrices(R, 3)
    assert [m.shape[0] for m in mats] == [3, 5, 7]
    for M in mats:
        np.testing.assert_allclose(M @ M.T, np.eye(M.shape[0]), atol=1e-6)
    # identity rotation -> identity matrices
    for M in sh_rotation_matrices(np.eye(3), 3):
        np.testing.assert_allclose(M, np.eye(M.shape[0]), atol=1e-6)


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_rotated_scene_rotated_camera_matches(deg):
    means, scales, quats, opac, colors = random_scene(120, 6)
    cfg = VanillaGaussianConfig(sh_degree=deg)
    state = cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                              capacity=128)
    # give SH rest some content so rotation actually matters
    if deg > 0:
        rng = np.random.RandomState(0)
        p = state.params.replace(
            shs_rest=state.params.shs_rest.at[:120].set(
                jnp.asarray(rng.normal(
                    0, 0.2, size=(120,) + state.params.shs_rest.shape[1:]
                ).astype(np.float32))),
            opacities=state.params.opacities.at[:120, 0].set(2.0))
        state = GaussianState(params=p, alive=state.alive)

    renderer = TileRendererConfig(max_per_tile=256, chunk=32,
                                  min_isect_capacity=8192).instantiate()
    cam = simple_camera(W, H)
    bg = jnp.zeros(3, jnp.float32)
    img0 = renderer.forward(state, cam, H, W, bg, deg).render

    R = _rot("y", 25) @ _rot("z", 40)
    t = np.array([0.3, -0.2, 0.1], np.float32)
    state2 = translate_state(rotate_state(state, R), t)
    # transform the camera the same way: w2c' = w2c @ inv([R|t])
    T4 = np.eye(4)
    T4[:3, :3] = R
    T4[:3, 3] = t
    w2c = np.eye(4)
    w2c[:3, :3] = np.asarray(cam.R)
    w2c[:3, 3] = np.asarray(cam.T)
    w2c2 = w2c @ np.linalg.inv(T4)
    cam2 = cam.replace(R=jnp.asarray(w2c2[:3, :3], jnp.float32),
                       T=jnp.asarray(w2c2[:3, 3], jnp.float32))
    img1 = renderer.forward(state2, cam2, H, W, bg, deg).render
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               rtol=1e-3, atol=2e-3)


def test_scale_state():
    means, scales, quats, opac, colors = random_scene(50, 2)
    cfg = VanillaGaussianConfig(sh_degree=0)
    state = cfg.init_from_pcd(np.asarray(means), np.asarray(colors),
                              capacity=64)
    s2 = scale_state(state, 2.0)
    np.testing.assert_allclose(np.asarray(s2.params.means),
                               np.asarray(state.params.means) * 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(s2.params.scales[:50])),
        np.asarray(jnp.exp(state.params.scales[:50])) * 2.0, rtol=1e-5)

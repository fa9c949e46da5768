"""Unit tests: quaternions, SH, projection invariants."""
import numpy as np
import jax.numpy as jnp

from gsl_tpu.ops.transforms import quat_to_rotmat, normalize_quat, build_cov3d
from gsl_tpu.ops.sh import (sh_to_rgb, rgb_to_sh0, sh0_to_rgb, sh_basis,
                            num_sh_bases, C0)
from gsl_tpu.ops.projection import project_gaussians

from scene_utils import random_scene, simple_camera


def test_quat_identity():
    q = jnp.array([[1.0, 0, 0, 0]])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)


def test_quat_rotmat_orthonormal():
    rng = np.random.RandomState(0)
    q = normalize_quat(jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32)))
    R = np.asarray(quat_to_rotmat(q))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_cov3d_isotropic():
    q = normalize_quat(jnp.asarray(
        np.random.RandomState(1).normal(size=(8, 4)).astype(np.float32)))
    s = jnp.full((8, 3), 0.5)
    cov = np.asarray(build_cov3d(s, q))
    eye = np.broadcast_to(0.25 * np.eye(3), cov.shape)
    np.testing.assert_allclose(cov, eye, atol=1e-5)


def test_sh_roundtrip_and_dc():
    rgb = jnp.array([[0.3, 0.6, 0.9]])
    sh0 = rgb_to_sh0(rgb)
    np.testing.assert_allclose(np.asarray(sh0_to_rgb(sh0)),
                               np.asarray(rgb), atol=1e-6)
    # degree-0 eval: rgb = C0*sh0 (+0.5 added by renderer)
    shs = sh0[:, None, :]
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = sh_to_rgb(shs, dirs, degree=0)
    np.testing.assert_allclose(np.asarray(out + 0.5), np.asarray(rgb),
                               atol=1e-6)


def test_sh_basis_count_and_norm():
    for deg in range(4):
        dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        b = sh_basis(dirs, deg)
        assert b.shape[-1] == num_sh_bases(deg)
    np.testing.assert_allclose(float(sh_basis(dirs, 0)[0, 0]), C0, atol=1e-7)


def test_projection_center_gaussian():
    cam = simple_camera(64, 48, f=70.0)
    means = jnp.array([[0.0, 0.0, 4.0]])
    scales = jnp.full((1, 3), 0.1)
    quats = jnp.array([[1.0, 0, 0, 0]])
    proj = project_gaussians(means, scales, quats, cam.world_to_camera,
                             cam.fx, cam.fy, cam.cx, cam.cy, 64, 48)
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32.0, 24.0],
                               atol=1e-4)
    assert float(proj.depths[0]) == 4.0
    assert int(proj.radii[0]) > 0
    assert bool(proj.mask[0])
    # isotropic gaussian: conic b term ~0, a == c
    np.testing.assert_allclose(float(proj.conics[0, 1]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(proj.conics[0, 0]),
                               float(proj.conics[0, 2]), rtol=1e-4)


def test_projection_culling():
    cam = simple_camera(64, 48)
    means = jnp.array([
        [0.0, 0.0, -1.0],     # behind camera
        [0.0, 0.0, 0.001],    # closer than min depth
        [100.0, 0.0, 1.0],    # far outside frustum
        [0.0, 0.0, 5.0],      # visible
    ])
    scales = jnp.full((4, 3), 0.05)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1))
    proj = project_gaussians(means, scales, quats, cam.world_to_camera,
                             cam.fx, cam.fy, cam.cx, cam.cy, 64, 48)
    assert list(np.asarray(proj.mask)) == [False, False, False, True]
    assert list(np.asarray(proj.radii[:3])) == [0, 0, 0]


def test_projection_compensation_bounds():
    means, scales, quats, _, _ = random_scene(256, seed=7)
    cam = simple_camera(64, 48)
    proj = project_gaussians(means, scales, quats, cam.world_to_camera,
                             cam.fx, cam.fy, cam.cx, cam.cy, 64, 48)
    comp = np.asarray(proj.compensations)[np.asarray(proj.mask)]
    assert np.all(comp > 0.0) and np.all(comp <= 1.0)

"""Quaternion / covariance math for 3D Gaussians (pure JAX, VPU-friendly).

Semantics match the reference EWA pipeline
(/root/reference/internal/utils/gaussian_projection.py:211-254,
 /root/reference/internal/utils/general_utils.py build_rotation): quaternions
are wxyz; Sigma = R S S^T R^T with S = diag(scales).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions [..., 4] (wxyz)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion [..., 4] -> rotation matrix [..., 3, 3].

    Assumes input is already normalized (call normalize_quat first).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """3D covariance Sigma = (R S)(R S)^T.

    scales: activated (positive) scales [..., 3]; quats: normalized wxyz [..., 4].
    Returns [..., 3, 3].
    """
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def depth_to_normal(depth: jnp.ndarray, world_to_camera: jnp.ndarray,
                    fx, fy, cx, cy) -> jnp.ndarray:
    """Estimate world-space normals from an expected-depth map.

    Parity with gsplat.utils.depth_to_normal as used by the reference
    normal-regularization metric (/root/reference/internal/metrics/
    normal_reg.py:29-35) and the 2DGS renderer's depths->points->cross
    recipe (/root/reference/internal/renderers/
    vanilla_2dgs_renderer.py:164-175): unproject each pixel to a
    camera-space point, rotate to world, take the normalized cross product
    of central differences. The one-pixel border is zero.

    depth [H, W]; world_to_camera [4, 4] column-vector convention
    (p_cam = R @ p_world + t, as produced by Cameras.world_to_camera).
    Returns [H, W, 3].
    """
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                          jnp.arange(W, dtype=depth.dtype), indexing="ij")
    x = (xs + 0.5 - cx) / fx * depth
    y = (ys + 0.5 - cy) / fy * depth
    pts_cam = jnp.stack([x, y, depth], axis=-1)            # [H, W, 3]
    # rotate to world: p_world_dir = R^T @ p_cam_dir, row form: cam @ R
    R = world_to_camera[:3, :3]
    pts = pts_cam @ R
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # safe normalize (linalg.norm VJP is 0/0 NaN on flat regions; this
    # feeds the differentiable normal-reg training loss — NOTES_ROUND5)
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(n2, 1e-18))
    return jnp.zeros((H, W, 3), depth.dtype).at[1:-1, 1:-1].set(n)

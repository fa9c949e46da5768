"""EWA splat projection: 3D Gaussians -> 2D screen-space splats (pure JAX).

This is the TPU analogue of gsplat's `fully_fused_projection` CUDA kernel as
used by the reference (/root/reference/internal/renderers/gsplat_v1_renderer.py:387-423)
and of its pure-python oracle
(/root/reference/internal/utils/gaussian_projection.py:6-288). It is fully
vectorized elementwise math over N — XLA fuses it into a handful of VPU loops;
no Pallas needed for this stage.

Numeric conventions preserved for parity (SURVEY.md §2.5):
- low-pass filter: cov2d diag += filter_2d (0.3 default), opacity
  compensation = sqrt(det_orig / det_blurred)
- radius = ceil(3 * sqrt(max eigenvalue)), eigen clamp mid^2-det >= 0.1
- Jacobian input point clamped to 1.3 * tan(fov)
- min depth 0.01; culled gaussians get radius 0 / zeroed outputs
- means2d in pixel coordinates with the +0.5 pixel-center offset applied at
  rasterization time, not here (gaussian_projection.py:86-94).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .transforms import quat_to_rotmat, normalize_quat


class Projections(NamedTuple):
    """Per-Gaussian screen-space projection results (all [N, ...])."""

    means2d: jnp.ndarray        # [N, 2] pixel coords
    depths: jnp.ndarray         # [N] camera-space z
    radii: jnp.ndarray          # [N] int32 pixel radius (0 = culled)
    conics: jnp.ndarray         # [N, 3] inverse cov2d (a, b, c) packed
    compensations: jnp.ndarray  # [N] AA opacity compensation
    mask: jnp.ndarray           # [N] bool visibility


def project_gaussians(
    means3d: jnp.ndarray,       # [N, 3]
    scales: jnp.ndarray,        # [N, 3] activated (positive)
    quats: jnp.ndarray,         # [N, 4] wxyz (need not be normalized)
    viewmat: jnp.ndarray,       # [4, 4] world-to-camera (column-vector conv.)
    fx, fy, cx, cy,             # scalars
    img_width: int,
    img_height: int,
    scale_modifier: float = 1.0,
    filter_2d: float = 0.3,
    min_depth: float = 0.01,
) -> Projections:
    f32 = means3d.dtype
    R_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]

    # world -> camera
    p_cam = means3d @ R_wc.T + t_wc  # [N, 3]
    depths = p_cam[..., 2]
    depth_ok = depths >= min_depth

    # 3D covariance Sigma = (R S)(R S)^T
    q = normalize_quat(quats)
    Rg = quat_to_rotmat(q)                      # [N, 3, 3]
    M = Rg * (scales * scale_modifier)[..., None, :]
    cov3d = M @ jnp.swapaxes(M, -1, -2)         # [N, 3, 3]

    # EWA Jacobian with fov clamping (gaussian_projection.py:257-287)
    tan_fovx = (0.5 * img_width) / fx
    tan_fovy = (0.5 * img_height) / fy
    z = depths
    inv_z = 1.0 / z
    tx = jnp.clip(p_cam[..., 0] * inv_z, -1.3 * tan_fovx, 1.3 * tan_fovx) * z
    ty = jnp.clip(p_cam[..., 1] * inv_z, -1.3 * tan_fovy, 1.3 * tan_fovy) * z

    # T = J @ R_wc, J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z
    # rows of T: T0 = j00*R0 + j02*R2 ; T1 = j11*R1 + j12*R2
    T0 = j00[..., None] * R_wc[0] + j02[..., None] * R_wc[2]   # [N, 3]
    T1 = j11[..., None] * R_wc[1] + j12[..., None] * R_wc[2]   # [N, 3]

    # cov2d = T Sigma T^T (2x2 symmetric -> 3 numbers)
    S_T0 = jnp.einsum("nij,nj->ni", cov3d, T0)
    S_T1 = jnp.einsum("nij,nj->ni", cov3d, T1)
    c00 = jnp.einsum("ni,ni->n", T0, S_T0)
    c01 = jnp.einsum("ni,ni->n", T0, S_T1)
    c11 = jnp.einsum("ni,ni->n", T1, S_T1)

    det_orig = c00 * c11 - c01 * c01
    c00 = c00 + filter_2d
    c11 = c11 + filter_2d
    det = c00 * c11 - c01 * c01
    compensations = jnp.sqrt(jnp.maximum(det_orig / det, 0.0))

    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / det, 0.0)
    conics = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    # project mean to pixel coords (no +0.5 here; rasterizer adds it)
    means2d = jnp.stack([
        fx * p_cam[..., 0] * inv_z + cx,
        fy * p_cam[..., 1] * inv_z + cy,
    ], axis=-1)

    # screen-space extent: 3 sigma of the max eigenvalue
    mid = 0.5 * (c00 + c11)
    sqrt_disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam_max = mid + sqrt_disc
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    # inside-frustum test: splat rect must intersect the image
    inside = (
        (means2d[..., 0] + radius > 0.0)
        & (means2d[..., 0] - radius < img_width)
        & (means2d[..., 1] + radius > 0.0)
        & (means2d[..., 1] - radius < img_height)
    )
    mask = depth_ok & det_ok & inside

    radii = jnp.where(mask, radius, 0.0).astype(jnp.int32)
    zero2 = jnp.zeros((), f32)
    return Projections(
        means2d=jnp.where(mask[..., None], means2d, zero2),
        depths=jnp.where(mask, depths, zero2),
        radii=radii,
        conics=jnp.where(mask[..., None], conics, zero2),
        compensations=jnp.where(mask, compensations, zero2),
        mask=mask,
    )


def tile_rect(projections: Projections, tile_size: int,
              tiles_x: int, tiles_y: int):
    """Inclusive-min / exclusive-max touched-tile rectangle per Gaussian
    (gaussian_projection.py:117-125 semantics, radii==0 -> empty rect)."""
    r = projections.radii.astype(jnp.float32)
    xy = projections.means2d
    rect_min_x = jnp.clip(((xy[..., 0] - r) / tile_size).astype(jnp.int32), 0, tiles_x)
    rect_min_y = jnp.clip(((xy[..., 1] - r) / tile_size).astype(jnp.int32), 0, tiles_y)
    rect_max_x = jnp.clip(((xy[..., 0] + r) / tile_size).astype(jnp.int32) + 1, 0, tiles_x)
    rect_max_y = jnp.clip(((xy[..., 1] + r) / tile_size).astype(jnp.int32) + 1, 0, tiles_y)
    empty = projections.radii <= 0
    rect_max_x = jnp.where(empty, rect_min_x, rect_max_x)
    rect_max_y = jnp.where(empty, rect_min_y, rect_max_y)
    return (
        jnp.stack([rect_min_x, rect_min_y], axis=-1),
        jnp.stack([rect_max_x, rect_max_y], axis=-1),
    )

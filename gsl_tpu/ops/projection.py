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

from .transforms import normalize_quat


class Projections(NamedTuple):
    """Per-Gaussian screen-space projection results (all [N, ...])."""

    means2d: jnp.ndarray        # [N, 2] pixel coords
    depths: jnp.ndarray         # [N] camera-space z
    radii: jnp.ndarray          # [N] int32 pixel radius (0 = culled)
    conics: jnp.ndarray         # [N, 3] inverse cov2d (a, b, c) packed
    compensations: jnp.ndarray  # [N] AA opacity compensation
    mask: jnp.ndarray           # [N] bool visibility
    depth_grads: jnp.ndarray = None
    """[N, 2] d(depth)/d(pixel): E[z | xy] plane slope (StopThePop
    per-tile/pixel depth keys); None unless requested"""


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
    # NaN hygiene: culled gaussians (z <= 0 etc.) must not produce inf/NaN
    # INSIDE the masked branches — 0 * inf = NaN leaks through jnp.where in
    # the backward pass and poisons the optimizer moments of dead slots.
    z_safe = jnp.where(depth_ok, depths, 1.0)

    # rotation matrix components from quats (explicit scalars: batched
    # [N,3,3] tensors compile pathologically slowly on TPU)
    q = normalize_quat(quats)
    w, x, y, zq = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + zq * zq)
    r01 = 2.0 * (x * y - w * zq)
    r02 = 2.0 * (x * zq + w * y)
    r10 = 2.0 * (x * y + w * zq)
    r11 = 1.0 - 2.0 * (x * x + zq * zq)
    r12 = 2.0 * (y * zq - w * x)
    r20 = 2.0 * (x * zq - w * y)
    r21 = 2.0 * (y * zq + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = scales[..., 0] * scale_modifier
    s1 = scales[..., 1] * scale_modifier
    s2 = scales[..., 2] * scale_modifier
    # M = R diag(s); Sigma = M M^T, 6 unique entries
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    sig00 = m00 * m00 + m01 * m01 + m02 * m02
    sig01 = m00 * m10 + m01 * m11 + m02 * m12
    sig02 = m00 * m20 + m01 * m21 + m02 * m22
    sig11 = m10 * m10 + m11 * m11 + m12 * m12
    sig12 = m10 * m20 + m11 * m21 + m12 * m22
    sig22 = m20 * m20 + m21 * m21 + m22 * m22

    # EWA Jacobian with fov clamping (gaussian_projection.py:257-287)
    tan_fovx = (0.5 * img_width) / fx
    tan_fovy = (0.5 * img_height) / fy
    z = z_safe
    inv_z = 1.0 / z_safe
    tx = jnp.clip(p_cam[..., 0] * inv_z, -1.3 * tan_fovx, 1.3 * tan_fovx) * z
    ty = jnp.clip(p_cam[..., 1] * inv_z, -1.3 * tan_fovy, 1.3 * tan_fovy) * z

    # T = J @ R_wc, J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z
    # rows of T: T0 = j00*R0 + j02*R2 ; T1 = j11*R1 + j12*R2
    t00 = j00 * R_wc[0, 0] + j02 * R_wc[2, 0]
    t01 = j00 * R_wc[0, 1] + j02 * R_wc[2, 1]
    t02 = j00 * R_wc[0, 2] + j02 * R_wc[2, 2]
    t10 = j11 * R_wc[1, 0] + j12 * R_wc[2, 0]
    t11 = j11 * R_wc[1, 1] + j12 * R_wc[2, 1]
    t12 = j11 * R_wc[1, 2] + j12 * R_wc[2, 2]

    # cov2d = T Sigma T^T (2x2 symmetric -> 3 numbers), fully elementwise
    st00 = sig00 * t00 + sig01 * t01 + sig02 * t02
    st01 = sig01 * t00 + sig11 * t01 + sig12 * t02
    st02 = sig02 * t00 + sig12 * t01 + sig22 * t02
    su00 = sig00 * t10 + sig01 * t11 + sig02 * t12
    su01 = sig01 * t10 + sig11 * t11 + sig12 * t12
    su02 = sig02 * t10 + sig12 * t11 + sig22 * t12
    c00 = t00 * st00 + t01 * st01 + t02 * st02
    c01 = t10 * st00 + t11 * st01 + t12 * st02
    c11 = t10 * su00 + t11 * su01 + t12 * su02

    # depth-plane slope for StopThePop-style depth keys: the conditional
    # mean E[z_cam | xy] is linear with slope Sigma_{z,xy} Sigma_xy^{-1};
    # cov(z_cam, x2d) = R_wc[2, :] . Sigma_world . t0 (and t1 for y)
    cov_zx = (R_wc[2, 0] * st00 + R_wc[2, 1] * st01 + R_wc[2, 2] * st02)
    cov_zy = (R_wc[2, 0] * su00 + R_wc[2, 1] * su01 + R_wc[2, 2] * su02)

    det_orig = c00 * c11 - c01 * c01
    c00 = c00 + filter_2d
    c11 = c11 + filter_2d
    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    compensations = jnp.sqrt(
        jnp.maximum(det_orig / det_safe, 1e-12))   # sqrt grad finite at ~0
    inv_det = jnp.where(det_ok, 1.0 / det_safe, 0.0)
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
    # kz = conic @ cov_{xy,z} (conic is the blurred-cov inverse)
    kz_x = conics[..., 0] * cov_zx + conics[..., 1] * cov_zy
    kz_y = conics[..., 1] * cov_zx + conics[..., 2] * cov_zy
    depth_grads = jnp.stack([kz_x, kz_y], axis=-1)
    return Projections(
        means2d=jnp.where(mask[..., None], means2d, zero2),
        depths=jnp.where(mask, depths, zero2),
        radii=radii,
        conics=jnp.where(mask[..., None], conics, zero2),
        compensations=jnp.where(mask, compensations, zero2),
        mask=mask,
        depth_grads=jnp.where(mask[..., None], depth_grads, zero2),
    )


def tile_rect(projections: Projections, tile_size: int,
              tiles_x: int, tiles_y: int):
    """Inclusive-min / exclusive-max touched-tile rectangle per Gaussian
    (gaussian_projection.py:117-125 semantics, radii==0 -> empty rect).

    Uses the 3-sigma ELLIPSE's per-axis AABB instead of the circumscribed
    circle: max |dx| on the contour {v^T Sigma^-1 v = 9} is exactly
    3 sqrt(Sigma_xx) (and likewise for y), and outside the AABB the marginal
    bound gives sigma > 4.5 — the same truncation level as the classic
    3-sigma circle. For anisotropic splats this cuts tile intersections
    20-40%, which every downstream stage (sort, raster, reduce) pays for
    linearly. Sigma's diagonal is recovered from the conic:
    Sigma = adj(conic) / det(conic)."""
    r = projections.radii.astype(jnp.float32)
    xy = projections.means2d
    ca = projections.conics[..., 0]
    cb = projections.conics[..., 1]
    cc = projections.conics[..., 2]
    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    rx = jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(cc / det, 0.0))), r)
    ry = jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(ca / det, 0.0))), r)
    rect_min_x = jnp.clip(((xy[..., 0] - rx) / tile_size).astype(jnp.int32), 0, tiles_x)
    rect_min_y = jnp.clip(((xy[..., 1] - ry) / tile_size).astype(jnp.int32), 0, tiles_y)
    rect_max_x = jnp.clip(((xy[..., 0] + rx) / tile_size).astype(jnp.int32) + 1, 0, tiles_x)
    rect_max_y = jnp.clip(((xy[..., 1] + ry) / tile_size).astype(jnp.int32) + 1, 0, tiles_y)
    empty = projections.radii <= 0
    rect_max_x = jnp.where(empty, rect_min_x, rect_max_x)
    rect_max_y = jnp.where(empty, rect_min_y, rect_max_y)
    return (
        jnp.stack([rect_min_x, rect_min_y], axis=-1),
        jnp.stack([rect_max_x, rect_max_y], axis=-1),
    )

"""Mip-Splatting: per-Gaussian 3D smoothing filter + 2D mip filter.

Math parity with the reference
(/root/reference/internal/models/mip_splatting.py:18-200,
 /root/reference/internal/renderers/gsplat_mip_splatting_renderer_v2.py:29):

- filter_3d = (min depth over visible train cameras) / max focal * sqrt(0.2),
  recomputed every `filter_3d_update_interval` (100) steps; invisible
  gaussians get the max visible distance,
- effective scales = sqrt(s^2 + f^2); opacity *= sqrt(prod s^2 / prod
  (s^2+f^2)) (3D opacity compensation),
- the renderer's 2D low-pass kernel shrinks from 0.3 to 0.1.

TPU-shape: the camera loop is a lax.scan over the (stacked) train camera
batch; filter_3d lives in GaussianState.extra["filter_3d"].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..data.cameras import Cameras
from .gaussian import GaussianState, VanillaGaussianConfig


@dataclasses.dataclass
class MipSplattingConfig(VanillaGaussianConfig):
    filter_3d_update_interval: int = 100
    opacity_compensation: bool = True


def compute_3d_filter(means: jnp.ndarray, alive: jnp.ndarray,
                      cameras: Cameras) -> jnp.ndarray:
    """means [CAP, 3], cameras batched [M]. Returns filter_3d [CAP, 1]."""
    big = 1e5

    def body(carry, cam):
        min_dist, any_valid, max_focal = carry
        p_cam = means @ cam.R.T + cam.T
        z = jnp.maximum(p_cam[:, 2], 1e-3)
        x = p_cam[:, 0] / z * cam.fx + cam.width.astype(jnp.float32) / 2.0
        y = p_cam[:, 1] / z * cam.fy + cam.height.astype(jnp.float32) / 2.0
        w = cam.width.astype(jnp.float32)
        h = cam.height.astype(jnp.float32)
        in_screen = ((x >= -0.15 * w) & (x <= 1.15 * w)
                     & (y >= -0.15 * h) & (y <= 1.15 * h))
        valid = (p_cam[:, 2] > 0.01) & in_screen
        min_dist = jnp.where(valid, jnp.minimum(min_dist, z), min_dist)
        any_valid = any_valid | valid
        max_focal = jnp.maximum(max_focal, cam.fx)
        return (min_dist, any_valid, max_focal), None

    init = (jnp.full((means.shape[0],), big, jnp.float32),
            jnp.zeros((means.shape[0],), bool), jnp.zeros((), jnp.float32))
    (min_dist, any_valid, max_focal), _ = lax.scan(body, init, cameras)

    # invisible gaussians: use the max distance among visible ones
    max_visible = jnp.max(jnp.where(any_valid & alive, min_dist, 0.0))
    min_dist = jnp.where(any_valid, min_dist, max_visible)
    filter_3d = min_dist / jnp.maximum(max_focal, 1e-6) * (0.2 ** 0.5)
    return filter_3d[:, None]


def apply_3d_filter(scales: jnp.ndarray, opacities: jnp.ndarray,
                    filter_3d: jnp.ndarray, opacity_compensation: bool = True):
    """scales/opacities ACTIVATED; returns (new_opacities, new_scales)."""
    s2 = scales * scales
    s2f = s2 + filter_3d * filter_3d
    new_scales = jnp.sqrt(s2f)
    if opacity_compensation:
        coef = jnp.sqrt(jnp.prod(s2, axis=-1) / jnp.prod(s2f, axis=-1))
        opacities = opacities * coef
    return opacities, new_scales

"""Glossy Gaussians with a learnable environment light.

Capability parity with the reference glossy model
(/root/reference/internal/model_components/envlight.py +
 internal/renderers/* glossy renderer, SURVEY §2.1): per-Gaussian specular
properties (metalness + per-gaussian normal from the smallest covariance
axis) and a learnable environment map; color = SH albedo + metalness *
env(reflect(view, normal)).

The reference wraps nvdiffrec's CUDA cubemap; here the environment is a
learnable equirectangular (latlong) map sampled bilinearly — same capability,
TPU-friendly gather + lerp.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transforms import normalize_quat, quat_to_rotmat


@dataclasses.dataclass
class EnvLightConfig:
    height: int = 64
    width: int = 128
    init_value: float = 0.5

    def instantiate(self):
        return self


def init_envmap(cfg: EnvLightConfig) -> jnp.ndarray:
    return jnp.full((cfg.height, cfg.width, 3), cfg.init_value, jnp.float32)


def sample_envmap(envmap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear latlong lookup. dirs [N, 3] (unit) -> rgb [N, 3]."""
    H, W, _ = envmap.shape
    theta = jnp.arccos(jnp.clip(dirs[:, 1], -1.0, 1.0))       # [0, pi]
    phi = jnp.arctan2(dirs[:, 2], dirs[:, 0])                 # [-pi, pi]
    v = theta / jnp.pi * (H - 1)
    u = (phi / (2.0 * jnp.pi) + 0.5) * (W - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = (u0 + 1) % W
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    return (envmap[v0, u0] * (1 - fu) * (1 - fv)
            + envmap[v0, u1] * fu * (1 - fv)
            + envmap[v1, u0] * (1 - fu) * fv
            + envmap[v1, u1] * fu * fv)


def gaussian_normals(scales_raw: jnp.ndarray, rotations: jnp.ndarray
                     ) -> jnp.ndarray:
    """Per-gaussian normal = rotation column of the smallest scale axis."""
    R = quat_to_rotmat(normalize_quat(rotations))      # [N, 3, 3]
    idx = jnp.argmin(scales_raw, axis=-1)              # [N]
    return jnp.take_along_axis(
        R, idx[:, None, None].repeat(3, axis=1), axis=2)[:, :, 0]


def glossy_rgbs(base_rgbs: jnp.ndarray, metalness: jnp.ndarray,
                envmap: jnp.ndarray, means: jnp.ndarray,
                scales_raw: jnp.ndarray, rotations: jnp.ndarray,
                camera_center: jnp.ndarray) -> jnp.ndarray:
    """rgb = clamp(albedo + m * env(reflect(view, normal)))."""
    view = means - camera_center
    # safe normalize (NaN-free VJP if a mean ever lands on the camera
    # center; same class as the depth_to_normal fix, NOTES_ROUND5)
    v2 = jnp.sum(view * view, axis=-1, keepdims=True)
    view = view * jax.lax.rsqrt(jnp.maximum(v2, 1e-16))
    n = gaussian_normals(scales_raw, rotations)
    # flip normals toward the camera
    n = n * jnp.sign(-jnp.sum(view * n, axis=-1, keepdims=True) + 1e-12)
    refl = view - 2.0 * jnp.sum(view * n, axis=-1, keepdims=True) * n
    spec = sample_envmap(envmap, refl)
    return jnp.clip(base_rgbs + metalness[:, None] * spec, 0.0, 1.0)

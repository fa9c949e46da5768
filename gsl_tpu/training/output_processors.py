"""Post-render image transforms with their own trainable parameters.

Parity with the reference output processors
(/root/reference/internal/output_processors/):
- BilateralGrid (bilagrid.py + lib_bilagrid.py 410LoC / fused-bilagrid CUDA,
  SURVEY §2.3 N8): per-image 16x16x8 grid of 3x4 affine color transforms,
  sliced bilinearly by (x, y, luminance); total-variation regularizer.
  On TPU the slice is a gather + lerp — pure JAX.
- Exposure (exposure.py): per-image 3x4 color transform.
- Vanilla: no-op.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

_LUMA = (0.299, 0.587, 0.114)


@dataclasses.dataclass
class BilateralGridConfig:
    grid_x: int = 16
    grid_y: int = 16
    grid_w: int = 8          # guidance (luminance) bins
    n_images: int = 1
    lr: float = 2e-3
    tv_weight: float = 10.0

    def instantiate(self):
        return self


def init_bilateral_grids(cfg: BilateralGridConfig) -> jnp.ndarray:
    """[n_images, gy, gx, gw, 12]: identity affine transforms."""
    ident = jnp.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], jnp.float32)
    return jnp.tile(
        ident, (cfg.n_images, cfg.grid_y, cfg.grid_x, cfg.grid_w, 1))


def slice_bilateral_grid(grid: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Apply one image's grid [gy, gx, gw, 12] to rgb [H, W, 3]."""
    gy, gx, gw, _ = grid.shape
    H, W, _ = rgb.shape
    luma = (rgb[..., 0] * _LUMA[0] + rgb[..., 1] * _LUMA[1]
            + rgb[..., 2] * _LUMA[2])

    def coords(n, size):
        c = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * n - 0.5
        return jnp.clip(c, 0.0, n - 1.0)

    cy = coords(gy, H)[:, None]
    cx = coords(gx, W)[None, :]
    cw = jnp.clip(luma * gw - 0.5, 0.0, gw - 1.0)

    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    w0 = jnp.floor(cw).astype(jnp.int32)
    fy, fx, fw = cy - y0, cx - x0, cw - w0
    y1 = jnp.minimum(y0 + 1, gy - 1)
    x1 = jnp.minimum(x0 + 1, gx - 1)
    w1 = jnp.minimum(w0 + 1, gw - 1)

    y0b, y1b = jnp.broadcast_to(y0, (H, W)), jnp.broadcast_to(y1, (H, W))
    x0b, x1b = jnp.broadcast_to(x0, (H, W)), jnp.broadcast_to(x1, (H, W))
    fyb = jnp.broadcast_to(fy, (H, W))[..., None]
    fxb = jnp.broadcast_to(fx, (H, W))[..., None]
    fwb = fw[..., None]

    def g(yi, xi, wi):
        return grid[yi, xi, wi]          # [H, W, 12]

    a = (g(y0b, x0b, w0) * (1 - fyb) * (1 - fxb)
         + g(y1b, x0b, w0) * fyb * (1 - fxb)
         + g(y0b, x1b, w0) * (1 - fyb) * fxb
         + g(y1b, x1b, w0) * fyb * fxb) * (1 - fwb)
    b = (g(y0b, x0b, w1) * (1 - fyb) * (1 - fxb)
         + g(y1b, x0b, w1) * fyb * (1 - fxb)
         + g(y0b, x1b, w1) * (1 - fyb) * fxb
         + g(y1b, x1b, w1) * fyb * fxb) * fwb
    A = (a + b).reshape(H, W, 3, 4)

    out = (jnp.einsum("hwij,hwj->hwi", A[..., :3], rgb) + A[..., 3])
    return out


def bilateral_grid_tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Total variation across the three grid dims (lib_bilagrid
    total_variation_loss semantics)."""
    loss = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        loss = loss + jnp.mean(d * d)
    return loss


@dataclasses.dataclass
class ExposureConfig:
    n_images: int = 1
    lr: float = 1e-3

    def instantiate(self):
        return self


def init_exposures(cfg: ExposureConfig) -> jnp.ndarray:
    ident = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    return jnp.tile(ident[None], (cfg.n_images, 1, 1))  # [n, 3, 4]


def apply_exposure(exposure: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """exposure [3, 4], rgb [H, W, 3]."""
    return jnp.einsum("ij,hwj->hwi", exposure[:, :3], rgb) \
        + exposure[:, 3][None, None, :]

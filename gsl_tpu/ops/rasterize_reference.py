"""Naive per-pixel oracle rasterizer (pure JAX, O(N*P), CPU-runnable).

Golden oracle for the tile rasterizers, mirroring the role of the reference's
pure-python projection oracle (/root/reference/internal/utils/gaussian_projection.py)
and the semantics of gsplat's `rasterize_to_pixels` CUDA kernel
(/root/reference/internal/renderers/gsplat_v1_renderer.py:568-588).

Compositing semantics (identical across all our rasterizer implementations):
  per pixel, iterate gaussians front-to-back in depth order:
    delta = mean2d - (pixel + 0.5)
    sigma = 0.5*(conic_a*dx^2 + conic_c*dy^2) + conic_b*dx*dy
    alpha = min(0.999, opacity * exp(-sigma))
    skip (continue) if sigma < 0 or alpha < 1/255
    next_T = T * (1 - alpha); if next_T <= 1e-4: break (no composite)
    out += alpha * T * channels;  T = next_T
  final: rgb += T * background; alpha_out = 1 - T
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.999
MIN_TRANSMITTANCE = 1e-4


def rasterize_oracle(
    means2d: jnp.ndarray,     # [N, 2]
    conics: jnp.ndarray,      # [N, 3]
    opacities: jnp.ndarray,   # [N]
    channels: jnp.ndarray,    # [N, C] colors (+ any extra composited channels)
    depths: jnp.ndarray,      # [N] for the front-to-back ordering
    mask: jnp.ndarray,        # [N] visibility from projection
    img_height: int,
    img_width: int,
    background: jnp.ndarray | None = None,  # [C]
    tile_rect_min: jnp.ndarray | None = None,  # [N, 2] optional: restrict a
    tile_rect_max: jnp.ndarray | None = None,  # gaussian to its binned tiles
    tile_size: int = 16,
):
    """Returns (channels [H, W, C], alpha [H, W])."""
    N, C = channels.shape
    order = jnp.argsort(jnp.where(mask, depths, jnp.inf))

    px = (jnp.arange(img_width, dtype=means2d.dtype) + 0.5)[None, :]
    py = (jnp.arange(img_height, dtype=means2d.dtype) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (img_height, img_width))
    py = jnp.broadcast_to(py, (img_height, img_width))
    tx = (jnp.arange(img_width) // tile_size)[None, :]
    ty = (jnp.arange(img_height) // tile_size)[:, None]
    tx = jnp.broadcast_to(tx, (img_height, img_width))
    ty = jnp.broadcast_to(ty, (img_height, img_width))

    def body(carry, g):
        T, out, done = carry
        xy = means2d[g]
        a_, b_, c_ = conics[g, 0], conics[g, 1], conics[g, 2]
        dx = xy[0] - px
        dy = xy[1] - py
        sigma = 0.5 * (a_ * dx * dx + c_ * dy * dy) + b_ * dx * dy
        alpha = jnp.minimum(MAX_ALPHA, opacities[g] * jnp.exp(-sigma))
        in_rect = jnp.bool_(True)
        if tile_rect_min is not None:
            in_rect = (
                (tx >= tile_rect_min[g, 0]) & (tx < tile_rect_max[g, 0])
                & (ty >= tile_rect_min[g, 1]) & (ty < tile_rect_max[g, 1])
            )
        skip = (sigma < 0.0) | (alpha < ALPHA_THRESHOLD) | ~mask[g] | ~in_rect
        next_T = T * (1.0 - alpha)
        brk = ~skip & (next_T <= MIN_TRANSMITTANCE)
        comp = ~done & ~skip & ~brk
        vis = jnp.where(comp, alpha * T, 0.0)
        out = out + vis[..., None] * channels[g]
        T = jnp.where(comp, next_T, T)
        done = done | brk
        return (T, out, done), None

    T0 = jnp.ones((img_height, img_width), means2d.dtype)
    out0 = jnp.zeros((img_height, img_width, C), means2d.dtype)
    done0 = jnp.zeros((img_height, img_width), bool)
    (T, out, _), _ = jax.lax.scan(body, (T0, out0, done0), order)

    alpha_out = 1.0 - T
    if background is not None:
        out = out + T[..., None] * background[None, None, :]
    return out, alpha_out

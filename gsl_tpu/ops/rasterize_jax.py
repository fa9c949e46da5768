"""Tile-based rasterizer, pure JAX/XLA version (differentiable by autodiff).

TPU-native replacement for gsplat's `rasterize_to_pixels` fwd+bwd CUDA kernels
(/root/reference/internal/renderers/gsplat_v1_renderer.py:568-640). Same
compositing semantics as `rasterize_reference.rasterize_oracle` (see there),
but organized the TPU way:

- tiles are the batch dimension (vectorized, not a python loop),
- each tile gathers a static-capacity window of its depth-sorted intersection
  range and scans over it in chunks,
- within a chunk, the per-pixel sequential transmittance recurrence is closed
  into a cumulative product, so the color accumulation becomes a
  (pixels x chunk) @ (chunk x channels) matmul on the MXU,
- the CUDA early-break (T <= 1e-4) is reproduced exactly with a `done` mask.

This path is the correctness anchor + CPU/test path; `rasterize_pallas` is the
production kernel with identical semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rasterize_reference import ALPHA_THRESHOLD, MAX_ALPHA, MIN_TRANSMITTANCE
from .tiling import TileIntersections


def _exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    inc = jnp.cumprod(x, axis=-1)
    return jnp.concatenate([jnp.ones_like(x[..., :1]), inc[..., :-1]], axis=-1)


def rasterize_tiles(
    means2d: jnp.ndarray,     # [N, 2]
    conics: jnp.ndarray,      # [N, 3]
    opacities: jnp.ndarray,   # [N]
    channels: jnp.ndarray,    # [N, C]
    isects: TileIntersections,
    img_height: int,
    img_width: int,
    tile_size: int = 16,
    max_per_tile: int = 1024,
    chunk: int = 64,
    background: jnp.ndarray | None = None,  # [C]
    remat: bool = True,
):
    """Returns (channels [H, W, C], alpha [H, W])."""
    N, C = channels.shape
    ts = tile_size
    tiles_x = -(-img_width // ts)
    tiles_y = -(-img_height // ts)
    n_tiles = tiles_x * tiles_y
    P = ts * ts
    cap = isects.gaussian_ids.shape[0]
    dtype = means2d.dtype

    # per-tile pixel centers [n_tiles, P]
    xs = jnp.arange(tiles_x * ts, dtype=dtype) + 0.5   # [W']
    ys = jnp.arange(tiles_y * ts, dtype=dtype) + 0.5   # [H']
    pix_x_img = jnp.broadcast_to(xs[None, :], (tiles_y * ts, tiles_x * ts))
    pix_y_img = jnp.broadcast_to(ys[:, None], (tiles_y * ts, tiles_x * ts))

    def to_tiles(img):  # [H', W'] -> [n_tiles, P]
        return (img.reshape(tiles_y, ts, tiles_x, ts)
                .transpose(0, 2, 1, 3).reshape(n_tiles, P))

    pix_x = to_tiles(pix_x_img)
    pix_y = to_tiles(pix_y_img)

    counts = jnp.minimum(isects.tile_counts, max_per_tile)  # [n_tiles]
    starts = isects.tile_starts

    n_chunks = -(-max_per_tile // chunk)

    def chunk_body(carry, k):
        T, out, done = carry  # [n_tiles, P], [n_tiles, P, C], [n_tiles, P]
        # gather this chunk's intersections for every tile
        local = k * chunk + jnp.arange(chunk, dtype=jnp.int32)  # [chunk]
        idx = starts[:, None] + local[None, :]                  # [n_tiles, chunk]
        valid = local[None, :] < counts[:, None]
        idx = jnp.clip(idx, 0, cap - 1)
        gid = jnp.take(isects.gaussian_ids, idx, axis=0)        # [n_tiles, chunk]
        gid = jnp.maximum(gid, 0)

        xy = jnp.take(means2d, gid, axis=0)       # [n_tiles, chunk, 2]
        con = jnp.take(conics, gid, axis=0)       # [n_tiles, chunk, 3]
        op = jnp.take(opacities, gid, axis=0)     # [n_tiles, chunk]
        ch = jnp.take(channels, gid, axis=0)      # [n_tiles, chunk, C]

        dx = xy[:, None, :, 0] - pix_x[:, :, None]   # [n_tiles, P, chunk]
        dy = xy[:, None, :, 1] - pix_y[:, :, None]
        sigma = (0.5 * (con[:, None, :, 0] * dx * dx
                        + con[:, None, :, 2] * dy * dy)
                 + con[:, None, :, 1] * dx * dy)
        alpha = jnp.minimum(MAX_ALPHA, op[:, None, :] * jnp.exp(-sigma))
        keep = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & valid[:, None, :]
        a = jnp.where(keep, alpha, 0.0)

        one_minus = 1.0 - a
        p_exc = T[..., None] * _exclusive_cumprod(one_minus)
        p_inc = p_exc * one_minus
        comp = (p_inc > MIN_TRANSMITTANCE) & (a > 0.0) & ~done[..., None]
        w = jnp.where(comp, a * p_exc, 0.0)          # [n_tiles, P, chunk]

        out = out + jnp.einsum("tpk,tkc->tpc", w, ch,
                               preferred_element_type=jnp.float32)
        T = T * jnp.prod(jnp.where(comp, one_minus, 1.0), axis=-1)
        done = done | jnp.any((p_inc <= MIN_TRANSMITTANCE) & (a > 0.0), axis=-1)
        return (T, out, done), None

    if remat:
        chunk_body = jax.checkpoint(chunk_body)

    T0 = jnp.ones((n_tiles, P), dtype)
    out0 = jnp.zeros((n_tiles, P, C), jnp.float32)
    done0 = jnp.zeros((n_tiles, P), bool)
    (T, out, _), _ = jax.lax.scan(
        chunk_body, (T0, out0, done0), jnp.arange(n_chunks, dtype=jnp.int32))

    out = out.astype(dtype)
    if background is not None:
        out = out + T[..., None] * background[None, None, :].astype(dtype)
    alpha = 1.0 - T

    # [n_tiles, P, C] -> [H, W, C]
    out = out.reshape(tiles_y, tiles_x, ts, ts, C)
    out = out.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, C)
    alpha = alpha.reshape(tiles_y, tiles_x, ts, ts)
    alpha = alpha.transpose(0, 2, 1, 3).reshape(tiles_y * ts, tiles_x * ts)
    return out[:img_height, :img_width], alpha[:img_height, :img_width]

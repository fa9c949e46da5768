"""Tile binning: expand gaussian->tile intersections and sort by (tile, depth).

TPU-native replacement for gsplat's `isect_tiles` + `isect_offset_encode` CUDA
kernels (/root/reference/internal/renderers/gsplat_v1_renderer.py:424-458).
Instead of atomics + device radix sort we use:
  1. static-capacity intersection expansion via exclusive cumsum +
     vectorized searchsorted (each slot finds its gaussian),
  2. `jax.lax.sort` with two keys (tile_id, depth) — XLA's bitonic sort maps
     well to the VPU,
  3. per-tile start offsets via vectorized searchsorted (the analogue of
     isect_offset_encode).
Everything is shape-static: `capacity` pads/truncates the intersection list
(the caller monitors `n_dropped` and grows capacity host-side when needed).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .projection import Projections, tile_rect


class TileIntersections(NamedTuple):
    gaussian_ids: jnp.ndarray  # [capacity] int32, sorted by (tile, depth)
    tile_ids: jnp.ndarray      # [capacity] int32; == n_tiles for padding
    tile_starts: jnp.ndarray   # [n_tiles] int32 offset into sorted list
    tile_counts: jnp.ndarray   # [n_tiles] int32
    n_isects: jnp.ndarray      # scalar int32: true intersection count
    n_dropped: jnp.ndarray     # scalar int32: intersections lost to capacity


def isect_encode(
    projections: Projections,
    img_height: int,
    img_width: int,
    tile_size: int,
    capacity: int,
) -> TileIntersections:
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y

    rect_min, rect_max = tile_rect(projections, tile_size, tiles_x, tiles_y)
    rect_w = rect_max[:, 0] - rect_min[:, 0]
    rect_h = rect_max[:, 1] - rect_min[:, 1]
    num_hit = (rect_w * rect_h).astype(jnp.int32)

    cum = jnp.cumsum(num_hit)                      # inclusive
    total = cum[-1]
    offsets = cum - num_hit                        # exclusive

    # slot -> owning gaussian via scatter + cummax (searchsorted with
    # `capacity` queries is a binary-search gather, ~100x slower on TPU)
    n_gauss = num_hit.shape[0]
    slots = jnp.arange(capacity, dtype=jnp.int32)
    gidx = jnp.arange(n_gauss, dtype=jnp.int32)
    start_marks = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(num_hit > 0, offsets, capacity)].max(
        gidx + 1, mode="drop")
    cm = lax.cummax(start_marks)
    g_safe = jnp.maximum(cm - 1, 0)
    valid = (slots < total) & (cm > 0)

    local = slots - offsets[g_safe]
    w = jnp.maximum(rect_w[g_safe], 1)
    t_y = rect_min[g_safe, 1] + local // w
    t_x = rect_min[g_safe, 0] + local % w
    tile_ids = jnp.where(valid, t_y * tiles_x + t_x, n_tiles).astype(jnp.int32)
    depths = jnp.where(valid, projections.depths[g_safe], jnp.inf)
    gaussian_ids = jnp.where(valid, g_safe, -1).astype(jnp.int32)

    sorted_tiles, _, sorted_gauss = lax.sort(
        (tile_ids, depths.astype(jnp.float32), gaussian_ids), num_keys=2)

    tile_starts = jnp.searchsorted(
        sorted_tiles, jnp.arange(n_tiles, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        sorted_tiles, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    ).astype(jnp.int32)

    return TileIntersections(
        gaussian_ids=sorted_gauss,
        tile_ids=sorted_tiles,
        tile_starts=tile_starts,
        tile_counts=ends - tile_starts,
        n_isects=jnp.minimum(total, capacity),
        n_dropped=jnp.maximum(total - capacity, 0),
    )

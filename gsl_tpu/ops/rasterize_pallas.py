"""Pallas TPU rasterizer: depth-sorted alpha compositing, forward + backward.

TPU-native replacement for gsplat's `rasterize_to_pixels` CUDA kernels
(/root/reference/internal/renderers/gsplat_v1_renderer.py:568-640), with the
exact compositing semantics of `rasterize_reference.rasterize_oracle`.

Design (see SURVEY.md §7 "hard parts"):

1. `isect_encode_padded` (XLA): after the (tile, depth) sort, each tile's
   intersection range is padded to a multiple of CHUNK and packed into a
   contiguous stream; padded slots point at a dummy zero-opacity gaussian, so
   the kernel needs no per-slot validity masks. A chunk schedule
   (tile id / first / last / position) drives the kernel grid.

2. Forward kernel: grid = (n_chunks,). The payload stream is field-major
   [8, capacity_padded] so each block [8, CHUNK] arrives lane-contiguous and
   Pallas double-buffers the DMA automatically. Per chunk, the sequential
   per-pixel transmittance recurrence is closed into matmuls on the MXU:
     lf = log1p(-alpha)                  [P, K]
     S_exc = lf @ U (strictly upper-tri) -> exclusive cumsum along K
     T_exc = T_carry * exp(S_exc)
     acc  += (comp * alpha * T_exc) @ colors^T
   The CUDA early-break (T <= 1e-4) is reproduced exactly and the break
   index i_stop is recorded per pixel for the backward pass. Accumulators
   live in VMEM scratch across the (sequential) grid; outputs flush on each
   tile's last chunk.

3. Backward kernel: reverse chunk walk. T is reconstructed back-to-front by
   the division trick (composited factors only, keyed off i_stop); suffix
   sums close into triangular matmuls the same way. Per-slot gradients are
   written to an output stream (no atomics) and segment-summed by gaussian
   id in XLA afterwards — absgrad (AbsGS) falls out as a second segment-sum
   of |slot grad| at identical granularity to the CUDA atomics version.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import Projections, tile_rect
from .rasterize_reference import (ALPHA_THRESHOLD, MAX_ALPHA,
                                  MIN_TRANSMITTANCE)

BIG_I32 = 2 ** 30  # python int: jnp constants would be captured as tracers


class PaddedIsects(NamedTuple):
    padded_ids: jnp.ndarray      # [capacity_padded] int32, dummy = n_gauss
    tile_of_chunk: jnp.ndarray   # [G] int32 (safe: trailing repeat last)
    first_flag: jnp.ndarray      # [G] int32 1/0
    last_flag: jnp.ndarray       # [G] int32 1/0
    valid_flag: jnp.ndarray      # [G] int32 1/0
    chunk_in_tile: jnp.ndarray   # [G] int32
    tile_counts: jnp.ndarray     # [n_tiles] int32 (unpadded)
    n_isects: jnp.ndarray        # scalar
    n_dropped: jnp.ndarray       # scalar
    # backward-reduction precompute: the per-gaussian gradient reduction
    # gathers slot grads back into expansion order (contiguous per gaussian)
    # and closes segments with one cumsum — no sort/scatter in the backward
    q_of_s: jnp.ndarray          # [capacity] expansion slot -> padded slot
    #                              (== capacity_padded for truncated slots)
    seg_starts: jnp.ndarray      # [N] first expansion slot of gaussian
    seg_ends: jnp.ndarray        # [N] one-past-last (clipped to capacity)


def isect_encode_padded(
    projections: Projections,
    img_height: int,
    img_width: int,
    tile_size: int,
    capacity: int,
    chunk: int,
    opacities=None,
    tile_based_culling: bool = False,
) -> PaddedIsects:
    """With `tile_based_culling` (StopThePop, reference
    gsplat_v1_renderer.py:35 `isect_tiles_tile_based_culling`), an
    intersection is dropped when the gaussian's peak alpha inside the tile
    (evaluated at the tile's closest point to the mean) is below 1/255 —
    same image, fewer chunks."""
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    G = capacity // chunk + n_tiles          # static chunk-slot bound
    capacity_padded = G * chunk

    rect_min, rect_max = tile_rect(projections, tile_size, tiles_x, tiles_y)
    rect_w = rect_max[:, 0] - rect_min[:, 0]
    rect_h = rect_max[:, 1] - rect_min[:, 1]
    num_hit = (rect_w * rect_h).astype(jnp.int32)
    n_gauss = num_hit.shape[0]

    cum = jnp.cumsum(num_hit)
    total = cum[-1]
    offsets = cum - num_hit

    # slot -> gaussian assignment. A searchsorted with `capacity` queries is
    # a 20-round binary-search gather (~100x slower than everything else);
    # instead scatter each gaussian's id at its start offset and cummax.
    # Empty gaussians scatter value 0 (a no-op for the max against the
    # zero-filled buffer) so the scatter indices stay SORTED — a sorted
    # scatter avoids XLA's serializing scatter path on TPU (~10x).
    slots = jnp.arange(capacity, dtype=jnp.int32)
    gidx = jnp.arange(n_gauss, dtype=jnp.int32)
    start_marks = jnp.zeros((capacity,), jnp.int32).at[
        jnp.minimum(offsets, capacity)].max(
        jnp.where(num_hit > 0, gidx + 1, 0), mode="drop",
        indices_are_sorted=True)
    cm_marks = jax.lax.cummax(start_marks)
    g_safe = jnp.maximum(cm_marks - 1, 0)
    valid = (slots < jnp.minimum(total, capacity)) & (cm_marks > 0)

    # one batched gather for all per-gaussian fields (ints bitcast to f32)
    rows = [
        lax.bitcast_convert_type(offsets, jnp.float32),
        lax.bitcast_convert_type(rect_min[:, 0], jnp.float32),
        lax.bitcast_convert_type(rect_min[:, 1], jnp.float32),
        lax.bitcast_convert_type(jnp.maximum(rect_w, 1), jnp.float32),
        projections.depths.astype(jnp.float32),
    ]
    if tile_based_culling:
        rows += [projections.means2d[:, 0], projections.means2d[:, 1],
                 projections.conics[:, 0], projections.conics[:, 1],
                 projections.conics[:, 2],
                 opacities.astype(jnp.float32)]
    packed = jnp.stack(rows, axis=0)                 # [5(+6), N]
    got = jnp.take(packed, g_safe, axis=1)           # [., capacity]
    off_s = lax.bitcast_convert_type(got[0], jnp.int32)
    rminx = lax.bitcast_convert_type(got[1], jnp.int32)
    rminy = lax.bitcast_convert_type(got[2], jnp.int32)
    w_s = lax.bitcast_convert_type(got[3], jnp.int32)
    depth_s = got[4]

    local = slots - off_s
    t_y = rminy + local // w_s
    t_x = rminx + local % w_s

    if tile_based_culling:
        # exact max alpha over the tile: min of the conic quadratic over the
        # tile box — 0 if the mean is inside, else the min over the four
        # edges (per-edge closed-form argmin of the 1-D quadratic)
        mx, my = got[5], got[6]
        ca, cb, cc, op = got[7], got[8], got[9], got[10]
        ts_f = jnp.float32(tile_size)
        xlo = t_x.astype(jnp.float32) * ts_f - mx
        xhi = xlo + ts_f
        ylo = t_y.astype(jnp.float32) * ts_f - my
        yhi = ylo + ts_f

        def sig(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        def edge_x(dx):      # fixed dx, optimize dy
            dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-12), ylo, yhi)
            return sig(dx, dy)

        def edge_y(dy):
            dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-12), xlo, xhi)
            return sig(dx, dy)

        sigma_min = jnp.minimum(
            jnp.minimum(edge_x(xlo), edge_x(xhi)),
            jnp.minimum(edge_y(ylo), edge_y(yhi)))
        inside = (xlo <= 0) & (xhi >= 0) & (ylo <= 0) & (yhi >= 0)
        sigma_min = jnp.where(inside, 0.0, jnp.maximum(sigma_min, 0.0))
        peak = op * jnp.exp(-sigma_min)
        valid = valid & (peak >= 1.0 / 255.0)

    tile_ids = jnp.where(valid, t_y * tiles_x + t_x, n_tiles).astype(jnp.int32)
    depths = jnp.where(valid, depth_s, jnp.inf)
    gauss_ids = jnp.where(valid, g_safe, n_gauss).astype(jnp.int32)

    # single packed sort key: [tile | float-depth bits] — one uint32
    # comparison instead of a 2-key lexicographic sort (XLA's TPU sort is the
    # dominant cost of binning; the key trick halves operands and compares).
    # Positive-float IEEE bits are monotone, so the top (32 - tile_bits)
    # bits of the depth order correctly; ties within ~10-bit mantissa
    # granularity fall back to (stable) gaussian order.
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    depth_bits = 32 - tile_bits
    dbits = lax.bitcast_convert_type(
        jnp.maximum(depths.astype(jnp.float32), 0.0), jnp.uint32)
    key = ((tile_ids.astype(jnp.uint32) << depth_bits)
           | (dbits >> tile_bits))
    # `order` (expansion slot per sorted position) feeds the backward's
    # gradient reduction: it lets the bwd map slot grads back to the
    # contiguous per-gaussian expansion layout with plain gathers
    sorted_keys, sorted_gauss, order = lax.sort(
        (key, gauss_ids, slots), num_keys=1)
    sorted_tiles = (sorted_keys >> depth_bits).astype(jnp.int32)

    tile_range = jnp.arange(n_tiles, dtype=jnp.uint32) << depth_bits
    tile_starts = jnp.searchsorted(sorted_keys, tile_range,
                                   side="left").astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_keys, jnp.arange(1, n_tiles + 1,
                                dtype=jnp.uint32) << depth_bits,
        side="left").astype(jnp.int32)
    counts = tile_ends - tile_starts

    # --- padded layout ---
    chunks_per_tile = -(-counts // chunk)            # ceil
    padded_counts = chunks_per_tile * chunk
    cum_padded = jnp.cumsum(padded_counts)
    padded_starts = cum_padded - padded_counts

    # padded layout built by GATHER (an 8M-row scatter measures ~3x slower
    # than gather on TPU): for each padded slot q, its tile comes from a
    # cummax over small scattered tile marks, and its source sorted index is
    # tile_starts[tile] + (q - padded_starts[tile]).
    q = jnp.arange(capacity_padded, dtype=jnp.int32)
    tmark = jnp.zeros((capacity_padded,), jnp.int32).at[
        jnp.minimum(padded_starts, capacity_padded)].max(
        jnp.where(padded_counts > 0,
                  jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0),
        mode="drop", indices_are_sorted=True)
    tile_of_q = jax.lax.cummax(tmark) - 1           # -1 before first tile
    t_safe = jnp.maximum(tile_of_q, 0)
    packed_ts = jnp.stack([tile_starts, padded_starts, counts], axis=0)
    got_ts = jnp.take(packed_ts, t_safe, axis=1)    # [3, capacity_padded]
    local_q = q - got_ts[1]
    src = jnp.clip(got_ts[0] + local_q, 0, capacity - 1)
    valid_q = (tile_of_q >= 0) & (local_q < got_ts[2])
    padded_ids = jnp.where(valid_q, jnp.take(sorted_gauss, src, axis=0),
                           n_gauss)

    # --- backward-reduction maps (expansion slot -> padded slot) ---
    # padded position of each SORTED position p (real entries only):
    #   q_of_p = padded_starts[tile(p)] + (p - tile_starts[tile(p)])
    p_iota = slots
    t_of_p = jnp.minimum(sorted_tiles, n_tiles - 1)
    packed_pt = jnp.stack([padded_starts, tile_starts], axis=0)
    got_pt = jnp.take(packed_pt, t_of_p, axis=1)            # [2, capacity]
    q_of_p = jnp.where(sorted_tiles < n_tiles,
                       got_pt[0] + (p_iota - got_pt[1]), capacity_padded)
    # sorted position of each EXPANSION slot: invert the sort permutation
    # (a second sort is ~2x faster than an unsorted 4M scatter on TPU)
    _, p_of_s = lax.sort((order, slots), num_keys=1)
    q_of_s = jnp.take(q_of_p, p_of_s)
    # per-gaussian expansion segments, clipped to the slot capacity
    seg_starts = jnp.minimum(offsets, capacity)
    seg_ends = jnp.minimum(cum, capacity)

    # --- chunk schedule ---
    cum_chunks = jnp.cumsum(chunks_per_tile)
    n_real_chunks = cum_chunks[-1]
    k = jnp.arange(G, dtype=jnp.int32)
    valid_chunk = k < n_real_chunks
    toc = jnp.searchsorted(cum_chunks, k, side="right").astype(jnp.int32)
    toc_safe = jnp.minimum(toc, n_tiles - 1)
    # trailing chunks: repeat the last real tile so output revisiting is safe
    last_real_tile = jnp.where(
        n_real_chunks > 0,
        jnp.searchsorted(cum_chunks, jnp.maximum(n_real_chunks - 1, 0),
                         side="right").astype(jnp.int32), 0)
    tile_of_chunk = jnp.where(valid_chunk, toc_safe,
                              jnp.minimum(last_real_tile, n_tiles - 1))
    chunks_before = cum_chunks[tile_of_chunk] - chunks_per_tile[tile_of_chunk]
    chunk_in_tile = jnp.where(valid_chunk, k - chunks_before, 0)
    first_flag = (valid_chunk & (chunk_in_tile == 0)).astype(jnp.int32)
    last_flag = (valid_chunk
                 & (k == cum_chunks[tile_of_chunk] - 1)).astype(jnp.int32)

    return PaddedIsects(
        padded_ids=padded_ids,
        tile_of_chunk=tile_of_chunk,
        first_flag=first_flag,
        last_flag=last_flag,
        valid_flag=valid_chunk.astype(jnp.int32),
        chunk_in_tile=chunk_in_tile.astype(jnp.int32),
        tile_counts=counts,
        n_isects=jnp.minimum(total, capacity),
        n_dropped=jnp.maximum(total - capacity, 0),
        q_of_s=q_of_s,
        seg_starts=seg_starts,
        seg_ends=seg_ends,
    )


def _gather_streams(means2d, conics, opacities, channels, padded_ids):
    """Field-major payload streams with a trailing dummy zero row.

    One batched take(axis=1) over all rows measures ~6x faster than
    per-field 1-D gathers on TPU (fixed per-gather overhead dominates)."""
    n, c = channels.shape
    zrow = jnp.zeros((1,), means2d.dtype)
    rows = jnp.stack([
        jnp.concatenate([means2d[:, 0], zrow]),
        jnp.concatenate([means2d[:, 1], zrow]),
        jnp.concatenate([conics[:, 0], zrow]),
        jnp.concatenate([conics[:, 1], zrow]),
        jnp.concatenate([conics[:, 2], zrow]),
        jnp.concatenate([opacities, zrow]),
    ] + [jnp.concatenate([channels[:, i], zrow]) for i in range(c)],
        axis=0)                                       # [6+c, n+1]
    stream = jnp.take(rows, padded_ids, axis=1)       # [6+c, m]
    m = padded_ids.shape[0]
    pad2 = jnp.zeros((2, m), means2d.dtype)
    geom_stream = jnp.concatenate([stream[:6], pad2], axis=0)  # [8, m]
    color_stream = stream[6:]
    return geom_stream, color_stream


def _pixel_coords(tile, tiles_x, tile_size):
    """Per-tile pixel centers as [P, 1] sublane vectors."""
    P = tile_size * tile_size
    p = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    tx = tile % tiles_x
    ty = tile // tiles_x
    px = (tx * tile_size + p % tile_size).astype(jnp.float32) + 0.5
    py = (ty * tile_size + p // tile_size).astype(jnp.float32) + 0.5
    return px, py


def _alphas(geom, px, py):
    """geom [8, K] block + pixel coords [P, 1] -> alpha, keep, sigma-aux."""
    x = geom[0:1, :]       # [1, K] -> broadcasts over P sublanes
    y = geom[1:2, :]
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    op = geom[5:6, :]
    dx = x - px            # [P, K]
    dy = y - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, raw)
    keep = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD)
    a = jnp.where(keep, alpha, 0.0)
    return a, keep, raw, dx, dy, ca[0], cb[0], cc[0], op[0], sigma


def _pack_flags(isects: "PaddedIsects") -> jnp.ndarray:
    """[G, 1] int32: bit0 valid, bit1 first, bit2 last, bits3+ chunk_in_tile
    — one SMEM word per grid step instead of 5 prefetched arrays (the
    schedule arrays overflow the 1MB SMEM budget at scale otherwise)."""
    return (isects.valid_flag | (isects.first_flag << 1)
            | (isects.last_flag << 2)
            | (isects.chunk_in_tile << 3)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    # scalar prefetch: tile id per chunk (used by the index maps) + packed
    # flags (bit0 valid, bit1 first, bit2 last, bits3+ chunk_in_tile)
    tile_ref, flags_ref,
    # inputs
    geom_ref, color_ref,
    # outputs
    out_ref, tfin_ref, istop_ref,
    # scratch
    acc, T, istop, alldone,
    *, tiles_x: int, tile_size: int, chunk: int, n_channels: int,
):
    k = pl.program_id(0)
    tile = tile_ref[k]
    fl = flags_ref[k]
    P = tile_size * tile_size

    @pl.when(((fl >> 1) & 1) == 1)
    def _():
        acc[...] = jnp.zeros_like(acc)
        T[...] = jnp.ones_like(T)
        istop[...] = jnp.full_like(istop, BIG_I32)
        alldone[0] = 0

    # early exit: once every pixel broke (T <= 1e-4), remaining chunks of
    # the tile are no-ops (the CUDA kernel's per-pixel `done` break)
    @pl.when(((fl & 1) == 1) & (alldone[0] == 0))
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        a, *_ = _alphas(geom_ref[...], px, py)

        base = (fl >> 3) * chunk
        idx = base + lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
        not_done = idx < istop[...]
        a = jnp.where(not_done, a, 0.0)

        lf = jnp.log1p(-a)
        # exclusive cumsum along K via strictly-lower-triangular matmul:
        # S_exc[p, j] = sum_{i<j} lf[p, i]
        tri = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               < lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1))
        S_exc = jnp.dot(lf, tri.astype(lf.dtype),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        T_exc = T[...] * jnp.exp(S_exc)
        T_inc = T_exc * (1.0 - a)

        comp = (T_inc > MIN_TRANSMITTANCE) & (a > 0.0)
        w = jnp.where(comp, a * T_exc, 0.0)
        acc[...] += jnp.dot(w, color_ref[...].T,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        lf_eff = jnp.where(comp, lf, 0.0)
        T[...] = T[...] * jnp.exp(jnp.sum(lf_eff, axis=1, keepdims=True))
        brk = (T_inc <= MIN_TRANSMITTANCE) & (a > 0.0)
        first_brk = jnp.min(jnp.where(brk, idx, BIG_I32), axis=1,
                            keepdims=True)
        istop[...] = jnp.minimum(istop[...], first_brk)
        alldone[0] = jnp.all(istop[...] < BIG_I32).astype(jnp.int32)

    @pl.when(((fl >> 2) & 1) == 1)
    def _():
        out_ref[0] = acc[...]
        tfin_ref[0, 0] = T[...][:, 0]
        istop_ref[0, 0] = istop[...][:, 0]


def _rasterize_fwd_raw(geom_stream, color_stream, isects: PaddedIsects,
                       n_tiles: int, tiles_x: int, tile_size: int,
                       chunk: int, interpret: bool):
    C = color_stream.shape[0]
    G = isects.tile_of_chunk.shape[0]
    P = tile_size * tile_size

    flags = _pack_flags(isects)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda k, t, f: (0, k)),
            pl.BlockSpec((C, chunk), lambda k, t, f: (0, k)),
        ],
        out_specs=[
            pl.BlockSpec((1, P, C), lambda k, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda k, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda k, t, f: (t[k], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, C), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out, tfin, istop = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, tile_size=tile_size,
                          chunk=chunk, n_channels=C),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, P, C), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32),
        ],
        interpret=interpret,
    )(isects.tile_of_chunk, flags, geom_stream, color_stream)
    return out, tfin, istop


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(
    # scalar prefetch: tile ids + packed flags (forward order); this kernel
    # walks the grid reversed, position = G-1-k
    tile_ref, flags_ref,
    # inputs
    geom_ref, color_ref, gout_ref, galpha_ref, tfin_ref, istop_ref,
    # outputs
    dgeom_ref, dcolor_ref,
    # scratch
    T_run, Sg, max_istop,
    *, tiles_x: int, tile_size: int, chunk: int, n_channels: int,
    bg_dot_g_on: bool,
):
    k = pl.program_id(0)
    pos = pl.num_programs(0) - 1 - k
    tile = tile_ref[pos]
    fl = flags_ref[pos]
    P = tile_size * tile_size

    # init per-tile carries on the tile's LAST forward chunk (first seen in
    # the reverse walk)
    @pl.when(((fl >> 2) & 1) == 1)
    def _():
        tf = tfin_ref[0, 0][:, None]                  # [P, 1]
        galpha = galpha_ref[0, 0][:, None]
        # Sg_init = T_final * (bg.g - galpha); bg term folded outside via
        # galpha' (see wrapper), so here: Sg = -T_final * galpha'
        Sg[...] = -tf * galpha
        T_run[...] = tf
        max_istop[0] = jnp.max(
            jnp.minimum(istop_ref[0, 0], BIG_I32 - 1)) + 1

    # chunks whose whole index range lies past every pixel's break point
    # contribute zero gradient; write zeros and skip the math
    active = ((fl & 1) == 1) & ((fl >> 3) * chunk < max_istop[0])

    @pl.when(active)
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        geom = geom_ref[...]
        a, keep, raw, dx, dy, ca, cb, cc, op, sigma = _alphas(geom, px, py)

        base = (fl >> 3) * chunk
        idx = base + lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
        comp = keep & (idx < istop_ref[0, 0][:, None])
        a = jnp.where(comp, a, 0.0)
        lf = jnp.log1p(-a)

        # inclusive suffix sum along K: S_inc[p, i] = sum_{j>=i} lf[p, j]
        tri_ge = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
                  >= lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1))
        S_inc = jnp.dot(lf, tri_ge.astype(lf.dtype),
                        preferred_element_type=jnp.float32)
        T_exc = T_run[...] * jnp.exp(-S_inc)          # T before gaussian i

        g = gout_ref[0]                               # [P, C]
        colors = color_ref[...]                       # [C, K]
        cg = jnp.dot(g, colors, preferred_element_type=jnp.float32)

        q = a * T_exc * cg                            # [P, K] (comp-masked)
        tri_gt = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
                  > lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1))
        Sq_strict = jnp.dot(q, tri_gt.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        Sg_i = Sg[...] + Sq_strict

        one_minus = jnp.maximum(1.0 - a, 1e-3)
        dalpha = jnp.where(comp, T_exc * cg - Sg_i / one_minus, 0.0)

        w = a * T_exc                                 # comp-masked via a
        # color grads [C, K] = g^T @ w (contract over pixels)
        dcolor_ref[...] = lax.dot_general(
            g, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        not_clamped = raw < MAX_ALPHA
        dsigma = jnp.where(not_clamped, -a * dalpha, 0.0)
        dop = jnp.where(not_clamped & comp, dalpha * jnp.exp(-sigma), 0.0)

        ddx = dsigma * (ca * dx + cb * dy)
        ddy = dsigma * (cc * dy + cb * dx)

        zero = jnp.zeros((1, chunk), jnp.float32)
        dgeom_ref[...] = jnp.concatenate([
            jnp.sum(ddx, axis=0, keepdims=True),
            jnp.sum(ddy, axis=0, keepdims=True),
            jnp.sum(dsigma * 0.5 * dx * dx, axis=0, keepdims=True),
            jnp.sum(dsigma * dx * dy, axis=0, keepdims=True),
            jnp.sum(dsigma * 0.5 * dy * dy, axis=0, keepdims=True),
            jnp.sum(dop, axis=0, keepdims=True),
            zero, zero,
        ], axis=0)

        # update carries (walking toward the front)
        T_run[...] = T_run[...] * jnp.exp(
            -jnp.sum(lf, axis=1, keepdims=True))
        Sg[...] = Sg[...] + jnp.sum(q, axis=1, keepdims=True)

    @pl.when(jnp.logical_not(active))
    def _():
        dgeom_ref[...] = jnp.zeros_like(dgeom_ref)
        dcolor_ref[...] = jnp.zeros_like(dcolor_ref)


def _rasterize_bwd_raw(geom_stream, color_stream, gout, galpha_eff, tfin,
                       istop, isects: PaddedIsects, n_tiles: int,
                       tiles_x: int, tile_size: int, chunk: int,
                       interpret: bool):
    C = color_stream.shape[0]
    G = isects.tile_of_chunk.shape[0]
    P = tile_size * tile_size
    flags = _pack_flags(isects)

    # the reverse walk indexes everything at pos = G-1-k inside index maps
    def rev(idx_fn):
        return lambda k, t, f: idx_fn(G - 1 - k, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((8, chunk), rev(lambda p, t: (0, p))),
            pl.BlockSpec((C, chunk), rev(lambda p, t: (0, p))),
            pl.BlockSpec((1, P, C), rev(lambda p, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 1, P), rev(lambda p, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 1, P), rev(lambda p, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 1, P), rev(lambda p, t: (t[p], 0, 0))),
        ],
        out_specs=[
            pl.BlockSpec((8, chunk), rev(lambda p, t: (0, p))),
            pl.BlockSpec((C, chunk), rev(lambda p, t: (0, p))),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),   # T_run
            pltpu.VMEM((P, 1), jnp.float32),   # Sg carry
            pltpu.SMEM((1,), jnp.int32),       # max istop (early exit)
        ],
    )
    dgeom, dcolor = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, tile_size=tile_size,
                          chunk=chunk, n_channels=C, bg_dot_g_on=False),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(geom_stream.shape, jnp.float32),
            jax.ShapeDtypeStruct(color_stream.shape, jnp.float32),
        ],
        interpret=interpret,
    )(isects.tile_of_chunk, flags, geom_stream, color_stream, gout,
      galpha_eff, tfin, istop)
    return dgeom, dcolor


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _tiles_to_image(x_tPC, tiles_y, tiles_x, ts, H, W):
    C = x_tPC.shape[-1]
    img = x_tPC.reshape(tiles_y, tiles_x, ts, ts, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, C)
    return img[:H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def rasterize_pallas(means2d, conics, opacities, channels, absgrad_tap,
                     isects, img_height, img_width, tile_size=16, chunk=128,
                     interpret=False):
    """Rasterize with the Pallas TPU kernels.

    Returns (channels_img [H, W, C] WITHOUT background blending,
             alpha [H, W]). Apply background as
    `img + (1 - alpha)[..., None] * bg` (differentiable in XLA).

    `absgrad_tap` [N, 2] zeros: its cotangent is the AbsGS statistic —
    sum over tiles of |per-(tile,gaussian) means2d gradient| (same
    granularity as gsplat's in-kernel absgrad accumulation).
    """
    out, _, _ = _fwd_impl(means2d, conics, opacities, channels, isects,
                          img_height, img_width, tile_size, chunk, interpret)
    return out


def _fwd_impl(means2d, conics, opacities, channels, isects,
              img_height, img_width, tile_size, chunk, interpret,
              want_streams=False):
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    geom_s, color_s = _gather_streams(means2d, conics, opacities, channels,
                                      isects.padded_ids)
    out_t, tfin_t, istop_t = _rasterize_fwd_raw(
        geom_s, color_s, isects, n_tiles, tiles_x, tile_size, chunk,
        interpret)
    # tiles with zero chunks were never written: force empty output
    empty = (isects.tile_counts == 0)
    out_t = jnp.where(empty[:, None, None], 0.0, out_t)
    tfin_t = jnp.where(empty[:, None, None], 1.0, tfin_t)
    istop_t = jnp.where(empty[:, None, None], BIG_I32, istop_t)
    ts = tile_size
    out = _tiles_to_image(out_t, tiles_y, tiles_x, ts, img_height, img_width)
    alpha = _tiles_to_image(1.0 - tfin_t.transpose(0, 2, 1), tiles_y,
                            tiles_x, ts,
                            img_height, img_width)[..., 0]
    if want_streams:
        return (out, alpha), tfin_t, istop_t, geom_s, color_s
    return (out, alpha), tfin_t, istop_t


def _rasterize_fwd(means2d, conics, opacities, channels, absgrad_tap,
                   isects, img_height, img_width, tile_size, chunk,
                   interpret):
    (out, alpha), tfin_t, istop_t, geom_s, color_s = _fwd_impl(
        means2d, conics, opacities, channels, isects, img_height, img_width,
        tile_size, chunk, interpret, want_streams=True)
    n = means2d.shape[0]
    res = (geom_s, color_s, isects, tfin_t, istop_t, n)
    return (out, alpha), res


def _image_to_tiles(img, tiles_y, tiles_x, ts):
    H, W = img.shape[:2]
    C = img.shape[2] if img.ndim == 3 else 1
    img = img.reshape(H, W, C)
    pad_h = tiles_y * ts - H
    pad_w = tiles_x * ts - W
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    img = img.reshape(tiles_y, ts, tiles_x, ts, C).transpose(0, 2, 1, 3, 4)
    return img.reshape(tiles_y * tiles_x, ts * ts, C)


def _rasterize_bwd(img_height, img_width, tile_size, chunk, interpret,
                   res, cotangents):
    geom_s, color_s, isects, tfin_t, istop_t, n = res
    g_out, g_alpha = cotangents
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    ts = tile_size

    gout_t = _image_to_tiles(g_out, tiles_y, tiles_x, ts)       # [T, P, C]
    galpha_t = _image_to_tiles(g_alpha, tiles_y, tiles_x,
                               ts).transpose(0, 2, 1)  # [T, 1, P]
    # alpha = 1 - T_final: dL/dT_final = -g_alpha. Fold into the Sg carry:
    # Sg_init = -T_final * galpha_eff with galpha_eff = g_alpha (see kernel:
    # Sg = -tf * galpha => dalpha gets +galpha*T_final/(1-a)).
    dgeom_s, dcolor_s = _rasterize_bwd_raw(
        geom_s, color_s, gout_t, galpha_t, tfin_t, istop_t, isects,
        n_tiles, tiles_x, ts, chunk, interpret)

    all_rows = jnp.concatenate(
        [dgeom_s[:6], jnp.abs(dgeom_s[0:2]), dcolor_s], axis=0)  # [8+C, m]
    summed = _segment_sum_by_inverse(all_rows, isects)[:n]       # [n, 8+C]
    d_means2d = summed[:, 0:2]
    d_conics = summed[:, 2:5]
    d_opac = summed[:, 5]
    d_abstap = summed[:, 6:8]
    d_channels = summed[:, 8:]
    d_isects = jax.tree.map(
        lambda x: np.zeros(np.shape(x), jax.dtypes.float0), isects)
    return d_means2d, d_conics, d_opac, d_channels, d_abstap, d_isects


rasterize_pallas.defvjp(_rasterize_fwd, _rasterize_bwd)


def _segment_sum_by_inverse(rows: jnp.ndarray,
                            isects: PaddedIsects) -> jnp.ndarray:
    """Per-gaussian reduction of [R, capacity_padded] slot rows.

    Slot grads are gathered back into EXPANSION order (contiguous per
    gaussian) through the `q_of_s` map precomputed by the encode, then every
    gaussian's segment closes with one cumsum + two boundary gathers. This
    replaces the round-1 sort-based reduction (5.2M sort + scatter-min/max
    per backward, ~290 ms/frame at bench scale) with gather+cumsum only
    (~25 ms) — the sort-order bookkeeping was already paid once in the
    forward encode."""
    capp = rows.shape[1]
    qs = isects.q_of_s                                  # [capacity]
    valid = qs < capp
    g = jnp.take(rows, jnp.minimum(qs, capp - 1), axis=1)
    g = jnp.where(valid[None, :], g, 0.0)               # [R, capacity]
    prefix = jnp.cumsum(g, axis=1)
    s0, s1 = isects.seg_starts, isects.seg_ends         # [N]
    hi = jnp.take(prefix, jnp.maximum(s1 - 1, 0), axis=1)
    lo = jnp.where((s0 > 0)[None, :],
                   jnp.take(prefix, jnp.maximum(s0 - 1, 0), axis=1), 0.0)
    out = jnp.where((s1 > s0)[None, :], hi - lo, 0.0)
    return out.T                                        # [N, R]

"""Pallas TPU rasterizer: depth-sorted alpha compositing, forward + backward.

TPU-native replacement for gsplat's `isect_tiles` / `isect_offset_encode` /
`rasterize_to_pixels` CUDA kernels
(/root/reference/internal/renderers/gsplat_v1_renderer.py:424-640), with the
exact compositing semantics of `rasterize_reference.rasterize_oracle`.

Round-2 redesign ("sort-centric, gather-free"). A device trace of the round-1
pipeline showed XLA gathers running at 1-12 GB/s on TPU — the expansion
gather, padded-layout build and backward permute cost ~310 ms/frame at
1M-gaussian/1080p scale, dwarfing the kernels. Every bulk random-access
data movement is therefore expressed as either

  (a) a `lax.sort` that CARRIES the payload as extra operands (the sort is
      the only efficient bulk permutation engine on TPU), or
  (b) a Pallas kernel whose random access is confined to a BOUNDED window,
      done as a one-hot matmul on the MXU (`precision=HIGH` is exact when
      one operand is an exact-bf16 one-hot matrix).

Pipeline:

1.  `isect_encode_padded` (XLA, [N]-sized only): tile rects, per-gaussian
    intersection counts. Every gaussian is assigned `max(count, 1)` slots —
    the dummy slot of a culled gaussian guarantees that any window of B
    consecutive expansion slots touches at most B+1 CONSECUTIVE gaussians,
    which is what makes the windowed Pallas kernels possible.

2.  EXPAND kernel: grid over 512-slot blocks; each block reads an aligned
    1024-row window of the per-gaussian table (two aligned BlockSpec inputs)
    and emits, per slot, the sort key `tile << depth_bits | depth_bits` and
    the full payload row (gid, means2d, conic, opacity, channels) via a
    one-hot MXU matmul. StopThePop tile-based culling (peak alpha < 1/255
    within the tile) is evaluated here and marks the key invalid.

3.  ONE `lax.sort` over (key, gid, payload...) orders all per-slot data by
    (tile, depth) in a single pass — no post-sort gathers.

4.  Tile ranges by `searchsorted`; the kernels then read the sorted stream
    directly at 128-ALIGNED blocks. A block straddling a tile boundary is
    visited once per tile with an in-kernel [lo, hi) lane mask — no padded
    copy of the stream is ever materialized.

5.  Forward kernel: per chunk, the sequential per-pixel transmittance
    recurrence closes into matmuls on the MXU:
      lf = log1p(-alpha)                  [P, K]
      S_exc = lf @ U (strictly upper-tri) -> exclusive cumsum along K
      T_exc = T_carry * exp(S_exc)
      acc  += (alpha * T_exc) @ colors^T
    The CUDA early-break (T <= 1e-4) is reproduced exactly; the break index
    i_stop (a global sorted position) is recorded per pixel for the backward.

6.  Backward kernel: reverse chunk walk, transmittance rebuilt back-to-front;
    per-slot gradients (incl. |d means2d| for AbsGS) written to the sorted
    layout (revisited boundary blocks accumulate read-modify-write).

7.  Reduction: `lax.sort` keyed on the carried gid groups each gaussian's
    slot gradients contiguously; the REDUCE kernel closes each group with a
    windowed one-hot matmul + a straddler carry (sequential TPU grid), and
    writes finished rows with the fixed-width overwrite trick.
"""
from __future__ import annotations

import functools
import os
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

BIG_I32 = 2 ** 30          # python int: jnp constants would become tracers
BIG_F32 = float(2 ** 30)
# Block sizes are env-overridable for on-TPU sweeps (tools/profile_stages.py)
EXPAND_BLOCK = int(os.environ.get("GSL_EXPAND_BLOCK", "512"))
                           # slots per expand grid step
WINDOW = 2 * EXPAND_BLOCK  # aligned gaussian-table window (>= BLOCK+1 + 511)
RED_B = int(os.environ.get("GSL_RED_B", "512"))
                           # reduce-kernel slot block (256 measured slower:
                           # grid overhead beats the halved one-hot matmul)
RED_W = int(os.environ.get("GSL_RED_W", str(-(-(RED_B + 8) // 128) * 128)))
                           # reduce-kernel gaussian window (>= RED_B + 8,
                           # multiple of 128)
TABLE_D = 16               # per-gaussian table lanes (11 + C, C <= 5)
STREAM_BLOCK = int(os.environ.get("GSL_STREAM_BLOCK", "1024"))
                           # slots per fwd/bwd grid step (8 inner sub-chunks);
                           # amortizes per-grid-step DMA/launch overhead
STP_WINDOW = 16            # StopThePop per-pixel resort window (exact
                           # within-window ordering; global key order across
                           # windows — the same locality class as CUDA STP's
                           # hierarchical resort window)


def _pack2(a, b):
    """Round two f32 rows to bf16 and pack the pair into one f32-typed row
    (bit payload only — sorts move payload bits verbatim)."""
    au = lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    bu = lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    u = (au.astype(jnp.uint32) << 16) | bu.astype(jnp.uint32)
    return lax.bitcast_convert_type(u, jnp.float32)


def _unpack2(x):
    u = lax.bitcast_convert_type(x, jnp.uint32)
    a = lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.bfloat16)
    b = lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.bfloat16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _pack_rows(rows):
    """[2k(+1) f32 rows] -> [k(+1) packed rows]; odd tail packs with zero."""
    out = []
    for i in range(0, len(rows) - 1, 2):
        out.append(_pack2(rows[i], rows[i + 1]))
    if len(rows) % 2:
        out.append(_pack2(rows[-1], jnp.zeros_like(rows[-1])))
    return out


def _unpack_rows(packed, n):
    out = []
    for p in packed:
        a, b = _unpack2(p)
        out.extend([a, b])
    return out[:n]


def _cumsum_mxu(x):
    """Inclusive cumsum of a non-negative int32 [N] vector via two-level
    MXU triangle matmuls on a [N/128, 128] reshape (XLA's 1D cumsum lowers
    to a slow multi-pass scan at bench scale).

    Exactness: computed in f32 with HIGHEST precision — exact for totals
    < 2^24. Beyond that (isect totals past 16.7M, far above any usable
    slot capacity) rounding is monotone and values >= 2^24 stay far above
    any real capacity, so every downstream `offsets <= s` / searchsorted
    comparison against slot ids s < capacity remains exact."""
    N = x.shape[0]
    M = -(-N // 128)
    xp = jnp.pad(x.astype(jnp.float32), (0, M * 128 - N)).reshape(M, 128)
    tri = (lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(
               jnp.float32)
    row_in = jnp.dot(xp, tri, precision=lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)   # [M, 128]
    row_tot = row_in[:, -1]                                # [M]
    if M > 256:
        prefix = _cumsum_mxu(row_tot)
    else:
        prefix = jnp.cumsum(row_tot)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.float32), prefix[:-1]])
    return (row_in + prefix[:, None]).reshape(M * 128)[:N]


class PaddedIsects(NamedTuple):
    """[N]-sized expansion precompute (no per-slot arrays)."""

    offsets: jnp.ndarray        # [N] i32 exclusive cumsum of max(num_hit, 1)
    rect_minx: jnp.ndarray      # [N] i32
    rect_miny: jnp.ndarray      # [N] i32
    rect_w_signed: jnp.ndarray  # [N] i32 (-1 marks a culled gaussian)
    depths: jnp.ndarray         # [N] f32 (stop-grad; sort key only)
    depth_grads: jnp.ndarray    # [N, 2] f32 (stop-grad; StopThePop keys)
    n_isects: jnp.ndarray       # scalar i32 (real intersections, capped)
    n_dropped: jnp.ndarray      # scalar i32 (slots beyond capacity)
    total_padded: jnp.ndarray   # scalar i32 (expansion slots incl. dummies)


def isect_encode_padded(
    projections: Projections,
    img_height: int,
    img_width: int,
    tile_size: int,
    capacity: int,
    chunk: int = 128,
    opacities=None,
    tile_based_culling: bool = False,
) -> PaddedIsects:
    """[N]-sized precompute. `opacities`/`tile_based_culling` are accepted
    for API compatibility; the peak-alpha culling itself now runs inside the
    expand kernel (pass `tile_based_culling=True` to `rasterize_pallas`)."""
    del chunk, opacities, tile_based_culling
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)

    rect_min, rect_max = tile_rect(projections, tile_size, tiles_x, tiles_y)
    rect_w = rect_max[:, 0] - rect_min[:, 0]
    rect_h = rect_max[:, 1] - rect_min[:, 1]
    num_hit = (rect_w * rect_h).astype(jnp.int32)
    # every gaussian gets >= 1 slot (culled ones get one INVALID dummy): this
    # bounds every window of B consecutive slots to <= B+1 CONSECUTIVE
    # gaussians, the invariant behind the windowed expand/reduce kernels
    num_pad = jnp.maximum(num_hit, 1)
    cum = _cumsum_mxu(num_pad)
    total = cum[-1].astype(jnp.int32)
    offsets = cum - num_pad.astype(jnp.float32)

    total_real = jnp.sum(num_hit)
    return PaddedIsects(
        offsets=offsets.astype(jnp.int32),
        rect_minx=rect_min[:, 0].astype(jnp.int32),
        rect_miny=rect_min[:, 1].astype(jnp.int32),
        rect_w_signed=jnp.where(num_hit > 0, jnp.maximum(rect_w, 1),
                                -1).astype(jnp.int32),
        depths=jax.lax.stop_gradient(
            projections.depths.astype(jnp.float32)),
        depth_grads=jax.lax.stop_gradient(
            projections.depth_grads.astype(jnp.float32)
            if projections.depth_grads is not None
            else jnp.zeros(rect_min.shape, jnp.float32)),
        n_isects=jnp.minimum(total_real, capacity).astype(jnp.int32),
        n_dropped=jnp.maximum(total - capacity, 0).astype(jnp.int32),
        total_padded=total.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# expand kernel: per-gaussian table windows -> per-slot key + payload rows
# ---------------------------------------------------------------------------

def _expand_kernel(
    glo_ref,                    # scalar prefetch: aligned window block index
    tot_ref,                    # scalar prefetch: [1] total expansion slots
    win0_ref, win1_ref,         # two aligned [EXPAND_BLOCK, TABLE_D] windows
    out_ref,                    # [TABLE_D, EXPAND_BLOCK]
    *, n_channels: int, tile_size: int, tiles_x: int, tiles_y: int,
    depth_bits: int, tile_based_culling: bool, stp_resort: bool,
    emit_depth: bool = False, rel_means: bool = False,
):
    b = pl.program_id(0)
    B = EXPAND_BLOCK
    base_g = glo_ref[b] * B     # first gaussian row of win0

    s = (b * B + lax.broadcasted_iota(jnp.int32, (1, B), 1)).astype(
        jnp.float32)                                   # [1, B] slot ids

    # g_local(s) = #(offsets <= s) - 1 over the 1024-row window
    offs0 = win0_ref[:, 0:1]                           # [B, 1]
    offs1 = win1_ref[:, 0:1]
    cnt = (jnp.sum((offs0 <= s).astype(jnp.float32), axis=0, keepdims=True)
           + jnp.sum((offs1 <= s).astype(jnp.float32), axis=0,
                     keepdims=True))                   # [1, B]
    g_local = cnt - 1.0                                # float row index

    # one-hot gather of the table row, computed in transposed orientation
    # (fields on sublanes, slots on lanes — same layout as the output).
    # The one-hot operand is exact in bf16, so a manual 3-way bf16 split
    # of the table values (Mosaic has no Precision.HIGH) reconstructs
    # them to 24 mantissa bits — the selection is EXACT for f32 table
    # data (incl. integer offsets < 2^24) at half the passes of HIGHEST.
    g_local_i = g_local.astype(jnp.int32)
    widx = lax.broadcasted_iota(jnp.int32, (B, B), 0)
    oh0 = (widx == g_local_i).astype(jnp.bfloat16)     # [W0, B]
    oh1 = (widx == (g_local_i - B)).astype(jnp.bfloat16)

    def sel3x(win, oh):
        w0 = win.astype(jnp.bfloat16)
        r0 = win - w0.astype(jnp.float32)
        w1 = r0.astype(jnp.bfloat16)
        w2 = (r0 - w1.astype(jnp.float32)).astype(jnp.bfloat16)
        # explicit DEFAULT: a global jax_default_matmul_precision=highest
        # (set by fit) would otherwise demand fp32 contraction on bf16
        # operands, which Mosaic rejects
        acc = lax.dot_general(w0, oh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.DEFAULT)
        acc += lax.dot_general(w1, oh, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.DEFAULT)
        acc += lax.dot_general(w2, oh, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.DEFAULT)
        return acc

    rowT = sel3x(win0_ref[...], oh0) + sel3x(win1_ref[...], oh1)

    offs = rowT[0:1, :]                                # [1, B]
    rminx = rowT[1:2, :].astype(jnp.int32)
    rminy = rowT[2:3, :].astype(jnp.int32)
    w_signed = rowT[3:4, :].astype(jnp.int32)
    depth = rowT[4:5, :]

    local = (s - offs).astype(jnp.int32)               # [1, B]
    w_use = jnp.maximum(w_signed, 1)
    t_y = jnp.minimum(rminy + local // w_use, tiles_y - 1)
    t_x = rminx + local % w_use
    tile = (t_y * tiles_x + t_x).astype(jnp.uint32)

    depth_c = depth
    if stp_resort:
        # StopThePop hierarchical level 0: order within each tile by the
        # depth PLANE evaluated at the tile center instead of the global
        # center depth (stp_renderer.py per-tile depth sorting)
        ts_f = jnp.float32(tile_size)
        tcx = (t_x.astype(jnp.float32) + 0.5) * ts_f
        tcy = (t_y.astype(jnp.float32) + 0.5) * ts_f
        kzx = rowT[11 + n_channels:12 + n_channels, :]
        kzy = rowT[12 + n_channels:13 + n_channels, :]
        mx_c = rowT[5:6, :]
        my_c = rowT[6:7, :]
        depth = depth + kzx * (tcx - mx_c) + kzy * (tcy - my_c)

    dbits = lax.bitcast_convert_type(jnp.maximum(depth, 0.0), jnp.uint32)
    key = (tile << depth_bits) | (dbits >> (32 - depth_bits))
    # invalid: culled gaussian's dummy slot, or slot past the expansion total
    invalid = (w_signed < 0) | (s.astype(jnp.int32) >= tot_ref[0])

    if tile_based_culling:
        # exact max alpha over the tile: min of the conic quadratic over the
        # tile box (0 if the mean is inside, else min over the four edges)
        mx, my = rowT[5:6, :], rowT[6:7, :]
        ca, cb = rowT[7:8, :], rowT[8:9, :]
        cc, op = rowT[9:10, :], rowT[10:11, :]
        ts_f = jnp.float32(tile_size)
        xlo = t_x.astype(jnp.float32) * ts_f - mx
        xhi = xlo + ts_f
        ylo = t_y.astype(jnp.float32) * ts_f - my
        yhi = ylo + ts_f

        def sig(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        def edge_x(dx):
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
        invalid = invalid | (peak < 1.0 / 255.0)

    key = jnp.where(invalid, jnp.uint32(0xFFFFFFFF), key)
    gid = jnp.float32(base_g) + g_local                 # float gaussian id

    # per-row writes (Mosaic-friendly; no sublane concat/transpose)
    out_ref[0:1, :] = lax.bitcast_convert_type(key, jnp.float32)
    out_ref[1:2, :] = gid
    if rel_means:
        # fast mode: means ride the sort as a TILE-CENTER-RELATIVE bf16
        # pair (packed post-kernel) — one fewer sort operand. The bf16
        # error is RELATIVE to the mean's distance from the tile, which is
        # the same scale as its distance from every pixel that reads it:
        # d(sigma) = conic . dx . err(dx) ~ 2 sigma * 2^-9 — the identical
        # class as the bf16 conic the fast path already carries. Subpixel
        # precision is preserved exactly where it matters (mean inside or
        # near the tile).
        ts_f = jnp.float32(tile_size)
        tcx = t_x.astype(jnp.float32) * ts_f + 0.5 * ts_f
        tcy = t_y.astype(jnp.float32) * ts_f + 0.5 * ts_f
        out_ref[2:3, :] = rowT[5:6, :] - tcx
        out_ref[3:4, :] = rowT[6:7, :] - tcy
        out_ref[4:8 + n_channels, :] = rowT[7:11 + n_channels, :]
    else:
        out_ref[2:8 + n_channels, :] = rowT[5:11 + n_channels, :]  # mx my a b c op ch..
    base_rows = 8 + n_channels
    if stp_resort:
        # per-pixel resort inputs: the ORIGINAL center depth + the depth
        # plane slopes, so the fwd/bwd kernels can evaluate E[z | xy] at
        # every pixel (d_p = depth + kz . (p - mean2d))
        out_ref[base_rows:base_rows + 1, :] = depth_c
        out_ref[base_rows + 1:base_rows + 2, :] = kzx
        out_ref[base_rows + 2:base_rows + 3, :] = kzy
        base_rows += 3
    if emit_depth:
        # exact-sort mode: the full f32 KEY depth rides as a secondary
        # lax.sort key (bit pattern; >= 0 so u32 order == float order)
        out_ref[base_rows:base_rows + 1, :] = jnp.maximum(depth, 0.0)
        base_rows += 1
    pad_rows = TABLE_D - base_rows
    if pad_rows:
        out_ref[base_rows:, :] = jnp.zeros((pad_rows, B), jnp.float32)


def _expand_sorted(means2d, conics, opacities, channels, isects,
                   capacity, tile_size, tiles_x, tiles_y, depth_bits,
                   tile_based_culling, interpret, fast=False,
                   stp_resort=False, exact_sort=False):
    """Build the per-gaussian table, expand to per-slot rows, sort by
    (tile | depth). Returns sorted (keys u32, gid f32, geom [8, cap],
    color [C, cap]). With `fast`, conic/opacity/color payload rides the
    sort as packed bf16 pairs (~3 fewer operands; sort cost is linear in
    operand count); fast non-STP means2d additionally pack as ONE
    tile-center-relative bf16 pair (rel_means — error relative to the
    tile-center distance, the same class as the bf16 conic's). means2d
    stay f32 only in exact mode and fast+stp_resort (the depth planes
    need absolute coords)."""
    n, c = channels.shape
    B = EXPAND_BLOCK
    assert capacity % B == 0, "isect capacity must be a multiple of 512"
    assert c <= TABLE_D - 11, f"at most {TABLE_D - 11} channels supported"

    cols = [isects.offsets.astype(jnp.float32),
            isects.rect_minx.astype(jnp.float32),
            isects.rect_miny.astype(jnp.float32),
            isects.rect_w_signed.astype(jnp.float32),
            isects.depths,
            means2d[:, 0], means2d[:, 1],
            conics[:, 0], conics[:, 1], conics[:, 2],
            opacities] + [channels[:, i] for i in range(c)]
    if stp_resort:
        assert c <= TABLE_D - 13, \
            "stp_resort needs 2 table lanes (<= 3 channels at TABLE_D=16)"
        cols += [isects.depth_grads[:, 0], isects.depth_grads[:, 1]]
    cols += [jnp.zeros((n,), jnp.float32)] * (TABLE_D - len(cols))
    table = jnp.stack(cols, axis=1)                    # [N, TABLE_D]
    # pad rows so any aligned window fits; padding offsets = +inf so the
    # g_local count never selects them
    pad = jnp.zeros((WINDOW + B, TABLE_D), jnp.float32)
    pad = pad.at[:, 0].set(BIG_F32).at[:, 3].set(-1.0)
    table = jnp.concatenate([table, pad], axis=0)

    n_blocks = capacity // B
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * B
    g_lo = jnp.clip(
        _searchsorted_vec(isects.offsets.astype(jnp.float32),
                          starts.astype(jnp.float32), side="right") - 1,
        0, n)
    glo_blk = g_lo // B                                # aligned window index
    total = jnp.minimum(isects.total_padded, capacity)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, TABLE_D), lambda k, g, t: (g[k], 0)),
            pl.BlockSpec((B, TABLE_D), lambda k, g, t: (g[k] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((TABLE_D, B), lambda k, g, t: (0, k)),
    )
    rel_means = fast and not stp_resort and _fast_closure_modes()[2]
    rows = pl.pallas_call(
        functools.partial(
            _expand_kernel, n_channels=c, tile_size=tile_size,
            tiles_x=tiles_x, tiles_y=tiles_y, depth_bits=depth_bits,
            tile_based_culling=tile_based_culling, stp_resort=stp_resort,
            emit_depth=exact_sort, rel_means=rel_means),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TABLE_D, capacity), jnp.float32),
        interpret=interpret,
    )(glo_blk, total[None].astype(jnp.int32), table, table)

    key = lax.bitcast_convert_type(rows[0], jnp.uint32)
    n_keys = 1
    key_ops = (key,)
    if exact_sort:
        # secondary key = full f32 depth bits -> the composite order is the
        # EXACT lexicographic (tile, f32 depth), retiring the packed-key
        # quantization entirely (the primary key's truncated depth bits are
        # a consistent prefix of the secondary, so the schedule's tile
        # searchsorted is unaffected)
        drow = (11 + c) if stp_resort else (8 + c)
        dkey = lax.bitcast_convert_type(rows[drow], jnp.uint32)
        n_keys = 2
        key_ops = (key, dkey)
    stp_rows = None
    if rel_means:
        # everything incl. the (tile-center-relative) means rides bf16:
        # key + gid + ceil((6 + c) / 2) packed operands (7 at c=3)
        payload = [rows[1]] + _pack_rows([rows[i] for i in range(2, 8 + c)])
        sorted_ops = lax.sort(key_ops + tuple(payload), num_keys=n_keys,
                              is_stable=True)
        sorted_keys = sorted_ops[0]
        o = n_keys
        gid_sorted = sorted_ops[o]
        n_packed = (6 + c + 1) // 2
        tail = _unpack_rows(sorted_ops[o + 1:o + 1 + n_packed],
                            6 + c)                      # mxr myr a b c op ch
        geom_rows = tail[:6]
        color_rows = tail[6:]
    elif fast:
        payload = ([rows[1], rows[2], rows[3]]          # gid, mx, my (f32)
                   + _pack_rows([rows[i] for i in range(4, 8 + c)]))
        if stp_resort:
            # +2 operands, STP mode only: depth stays f32 (ordering
            # precision); the two plane slopes pack as a bf16 pair
            payload += [rows[8 + c], _pack2(rows[9 + c], rows[10 + c])]
        sorted_ops = lax.sort(key_ops + tuple(payload), num_keys=n_keys,
                              is_stable=True)
        sorted_keys = sorted_ops[0]
        o = n_keys
        gid_sorted = sorted_ops[o]
        n_packed = (4 + c + 1) // 2
        tail = _unpack_rows(sorted_ops[o + 3:o + 3 + n_packed],
                            4 + c)                      # a b c op ch
        geom_rows = [sorted_ops[o + 1], sorted_ops[o + 2]] + tail[:4]
        color_rows = tail[4:]
        if stp_resort:
            kzx_s, kzy_s = _unpack2(sorted_ops[o + 4 + n_packed])
            stp_rows = [sorted_ops[o + 3 + n_packed], kzx_s, kzy_s]
    else:
        n_rows = (11 + c) if stp_resort else (8 + c)
        sorted_ops = lax.sort(key_ops + tuple(rows[1:n_rows]),
                              num_keys=n_keys, is_stable=True)
        sorted_keys = sorted_ops[0]
        o = n_keys
        gid_sorted = sorted_ops[o]
        geom_rows = list(sorted_ops[o + 1:o + 7])
        color_rows = list(sorted_ops[o + 7:o + 7 + c])
        if stp_resort:
            stp_rows = list(sorted_ops[o + 7 + c:o + 10 + c])
    zrow = jnp.zeros((2, capacity), jnp.float32)
    geom_s = jnp.concatenate(
        [jnp.stack(geom_rows, axis=0), zrow], axis=0)   # [8, cap]
    color_s = jnp.stack(color_rows, axis=0)             # [C, cap]
    stp_s = None
    if stp_resort:
        # [8, cap] side stream (depth, kzx, kzy + sublane padding): f32
        # Mosaic blocks want 8 sublanes
        stp_s = jnp.concatenate(
            [jnp.stack(stp_rows, axis=0),
             jnp.zeros((5, capacity), jnp.float32)], axis=0)
    return sorted_keys, gid_sorted, geom_s, color_s, stp_s


# (A pure-XLA gather-based expand variant — sort only (key, slot_id) and
# gather payload after — was measured SLOWER on the live v5e in round 3
# (GSL_EXPAND_MODE=xla, NOTES_ROUND3.md): the post-sort [cap]-sized gathers
# run at gather speed, which is exactly what the payload-carrying sort
# design avoids. Removed in round 4; see git history for the code.)


# ---------------------------------------------------------------------------
# chunk schedule over the SORTED stream (aligned blocks, [G]-sized XLA)
# ---------------------------------------------------------------------------

class ChunkSchedule(NamedTuple):
    blk: jnp.ndarray            # [G] i32 aligned block index into the stream
    tile_of_chunk: jnp.ndarray  # [G] i32 (trailing: repeat last real tile)
    flags: jnp.ndarray          # [G] i32 packed (see _pack_flags)
    tile_counts: jnp.ndarray    # [n_tiles] i32


def _searchsorted_vec(keys, queries, side="left", pad_value=None):
    """searchsorted of `queries` into SORTED `keys` as two broadcast-compare
    passes instead of XLA's ~log2(N) serial gather rounds: a count over the
    128-decimated keys picks the 128-row, one contiguous row-gather + lane
    count refines. `pad_value` must compare >= every key (and must not
    compare < / <= any query). Returns i32.

    Derivation: p := #(keys OP q) (OP is < for side='left', <= for
    'right'). pos1 = #(D1 OP q) over D1 = keys[::128] brackets p into
    [128*pos1 - 127, 128*pos1], which lies inside row pos1-1 (plus its
    right edge), so counting OP within that one row recovers p exactly;
    pos1 == 0 means p == 0 and row 0 counts 0."""
    n = keys.shape[0]
    M = -(-n // 128)
    if pad_value is None:
        # the uint32 default pad 0xFFFFFFFF satisfies the contract only
        # for side='left' (a query equal to the pad would count pad rows
        # under <=); side='right' uint32 callers must pass an explicit
        # pad (ADVICE r4)
        assert side == "left" or keys.dtype != jnp.uint32, \
            "uint32 side='right' requires an explicit pad_value"
        pad_value = (jnp.uint32(0xFFFFFFFF) if keys.dtype == jnp.uint32
                     else jnp.inf)
    kp = jnp.pad(keys, (0, M * 128 - n),
                 constant_values=pad_value).reshape(M, 128)
    D1 = kp[:, 0]                                       # keys[::128]

    def cmp(a, b):
        return (a < b) if side == "left" else (a <= b)

    pos1 = jnp.sum(cmp(D1[None, :], queries[:, None]).astype(jnp.int32),
                   axis=1)                              # [Q]
    r = jnp.maximum(pos1 - 1, 0)
    rows = jnp.take(kp, r, axis=0)                      # [Q, 128]
    cnt = jnp.sum(cmp(rows, queries[:, None]).astype(jnp.int32), axis=1)
    return jnp.minimum(r * 128 + cnt, n)


def _build_schedule(sorted_keys, n_tiles, depth_bits, capacity, sb):
    """One entry per (tile, STREAM_BLOCK) pair; `sb`-local [lo, hi) packed in
    the flags (13 bits each)."""
    G = capacity // sb + n_tiles
    tile_range = jnp.arange(n_tiles + 1, dtype=jnp.uint32) << depth_bits
    bounds = _searchsorted_vec(sorted_keys, tile_range)
    tile_starts, tile_ends = bounds[:-1], bounds[1:]
    counts = tile_ends - tile_starts

    first_blk = tile_starts // sb
    nblocks_t = jnp.where(counts > 0,
                          (tile_ends - 1) // sb - first_blk + 1, 0)
    cum_chunks = jnp.cumsum(nblocks_t)
    n_real = cum_chunks[-1]

    # chunk -> tile fill-forward (G-sized scatter+cummax: trivially small)
    k = jnp.arange(G, dtype=jnp.int32)
    chunk_starts = cum_chunks - nblocks_t
    marks = jnp.zeros((G,), jnp.int32).at[
        jnp.minimum(chunk_starts, G)].max(
        jnp.where(nblocks_t > 0,
                  jnp.arange(n_tiles, dtype=jnp.int32) + 1, 0),
        mode="drop", indices_are_sorted=True)
    cm = jax.lax.cummax(marks)
    valid_chunk = (k < n_real) & (cm > 0)
    toc = jnp.maximum(cm - 1, 0)
    last_real_tile = jnp.where(
        n_real > 0, jnp.maximum(jnp.max(cm) - 1, 0), 0)
    tile_of_chunk = jnp.where(valid_chunk, toc, last_real_tile)

    t = tile_of_chunk
    k_in_tile = k - jnp.take(chunk_starts, t)
    blk = jnp.take(first_blk, t) + jnp.where(valid_chunk, k_in_tile, 0)
    blk = jnp.clip(blk, 0, capacity // sb - 1)
    base = blk * sb
    lo = jnp.clip(jnp.take(tile_starts, t) - base, 0, sb)
    hi = jnp.clip(jnp.take(tile_ends, t) - base, 0, sb)
    first = valid_chunk & (k_in_tile == 0)
    last = valid_chunk & (k_in_tile == jnp.take(nblocks_t, t) - 1)

    assert sb <= 4096, "lo/hi flag fields hold 13 bits (values <= sb)"
    flags = (valid_chunk.astype(jnp.int32)
             | (first.astype(jnp.int32) << 1)
             | (last.astype(jnp.int32) << 2)
             | (lo << 3) | (hi << 16)).astype(jnp.int32)
    return ChunkSchedule(blk=blk.astype(jnp.int32),
                         tile_of_chunk=tile_of_chunk.astype(jnp.int32),
                         flags=flags, tile_counts=counts)


def _unpack(fl):
    # 13-bit lo/hi fields (values in [0, sb], so sb up to 4096): 3 flag
    # bits + 2x13 = 29 bits of the i32. The round-5 STREAM_BLOCK sweep
    # initially ran on the old 11-bit fields, which sb=2048 silently
    # overflowed — widen BEFORE sweeping block sizes.
    return ((fl & 1) == 1, ((fl >> 1) & 1) == 1, ((fl >> 2) & 1) == 1,
            (fl >> 3) & 0x1FFF, (fl >> 16) & 0x1FFF)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _pixel_coords(tile, tiles_x, tile_size):
    P = tile_size * tile_size
    p = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    tx = tile % tiles_x
    ty = tile // tiles_x
    px = (tx * tile_size + p % tile_size).astype(jnp.float32) + 0.5
    py = (ty * tile_size + p // tile_size).astype(jnp.float32) + 0.5
    return px, py


def _moment_basis(tile_size):
    """Tile-CENTER-relative degree-2 pixel basis [P, 8], split hi/lo bf16.

    Rows: (1, pxc, pyc, pxc^2, pxc*pyc, pyc^2, 0, 0) with pxc, pyc in
    [-(ts/2 - 0.5), ts/2 - 0.5]. Center-relative keeps products <= ~56
    at tile 16, so the hi+lo bf16 split represents every basis value
    EXACTLY (<= 11 significant bits); the basis rides the MXU against a
    bf16 dsigma in the backward's moment matmul. Constant per kernel
    instance (no tile dependence)."""
    P = tile_size * tile_size
    p = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    half = jnp.float32(tile_size) * 0.5
    px = (p % tile_size).astype(jnp.float32) + 0.5 - half
    py = (p // tile_size).astype(jnp.float32) + 0.5 - half
    one = jnp.ones_like(px)
    z = jnp.zeros_like(px)
    vt = jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, z, z], axis=1)
    hi = vt.astype(jnp.bfloat16)
    lo = (vt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _alphas_mxu(geom, basis_hi, basis_lo, cx, cy):
    """Fast-mode alpha evaluation with the sigma quadratic on the MXU.

    sigma(p, j) is a degree-2 polynomial in the tile-center-relative pixel
    coords, so it closes into basis @ Q: basis [P, 8] is the exact hi/lo
    bf16 split of (1, px, py, px^2, px*py, py^2, 0, 0) (see _moment_basis),
    Q [8, K] the per-splat quadratic coefficients (cheap [1, K] row math).
    Q is hi/lo split too: the constant term 0.5*ca*x^2 can reach ~10^2
    while sigma at contributing pixels is O(1) — single-bf16 coefficients
    would lose ~e^0.25 of alpha to cancellation; the 3-matmul hi/lo
    product keeps the error at the 2^-16 class, below the bf16 payload
    rounding the fast path already carries. Replaces ~10 VPU passes over
    [P, K] with 3 MXU matmuls (~24 MACs/pair; measured VPU-bound kernels).

    Returns (a, keep, raw) — fast mode needs no dx/dy/sigma outputs.
    `cx=None`: the geom means are ALREADY tile-center-relative (the
    expand kernel's rel_means packing)."""
    if cx is None:
        x = geom[0:1, :]                               # [1, K] centered
        y = geom[1:2, :]
    else:
        x = geom[0:1, :] - cx
        y = geom[1:2, :] - cy
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    op = geom[5:6, :]
    q0 = (0.5 * ca) * x * x + cb * x * y + (0.5 * cc) * y * y
    q1 = -(ca * x + cb * y)
    q2 = -(cb * x + cc * y)
    z = jnp.zeros_like(x)
    Q = jnp.concatenate([q0, q1, q2, 0.5 * ca, cb, 0.5 * cc, z, z],
                        axis=0)                        # [8, K]
    Qhi = Q.astype(jnp.bfloat16)
    Qlo = (Q - Qhi.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(b, q):
        return lax.dot_general(b, q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.DEFAULT)

    sigma = mm(basis_hi, Qhi) + (mm(basis_hi, Qlo) + mm(basis_lo, Qhi))
    raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, raw)
    keep = alpha >= ALPHA_THRESHOLD
    a = jnp.where(keep, alpha, 0.0)
    return a, keep, raw


def _alphas(geom, px, py, check_sigma=True):
    """geom [6, K] block + pixel coords [P, 1] -> alpha and aux terms.

    `check_sigma=False` (fast mode) drops the sigma >= 0 validity test:
    the quadratic form is PSD so it can only fail by rounding asymmetry
    at sigma ~ 0; exact mode keeps it for bit-parity with the oracle.
    The factored sigma saves two [P, K] passes ((0.5*ca) and (0.5*cc)
    are [1, K] row ops).

    (A 2x-packed bf16 variant of these passes was measured SLOWER on the
    live v5e — fwd 34.0 vs 30.8 ms; the cast traffic eats the packing win.
    NOTES_ROUND4.md experiment E4.)"""
    x = geom[0:1, :]
    y = geom[1:2, :]
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    op = geom[5:6, :]
    dx = x - px
    dy = y - py
    if check_sigma:
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    else:
        sigma = dx * ((0.5 * ca) * dx + cb * dy) + (0.5 * cc) * dy * dy
    raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, raw)
    keep = alpha >= ALPHA_THRESHOLD
    if check_sigma:
        keep = (sigma >= 0.0) & keep
    a = jnp.where(keep, alpha, 0.0)
    return a, keep, raw, dx, dy, ca[0], cb[0], cc[0], op[0], sigma


def _fast_closure_modes():
    """Fast-mode closure selection (VERDICT r4 weak #1: the round-4 closure
    swap regressed 15.4M -> 12.7M px/s on the live v5e; both closures are
    kept selectable so each lever is measured in isolation).

    GSL_FAST_TRANSMIT: 'matmul' (log1p -> triangle matmul -> exp; round-3
    winner) | 'scan' (Hillis-Steele cumprod doubling scan).
    GSL_FAST_SIGMA: 'vpu' (factored quadratic, VPU passes; round-3 winner)
    | 'mxu' (hi/lo bf16 basis @ Q matmuls).
    GSL_FAST_RELMEANS: '1' pack means2d as one tile-center-relative bf16
    sort operand | '0' keep f32 means (two operands, round-3 layout).

    Read at TRACE time — set before the first jit of a rasterize call
    (bench/tests run one setting per process)."""
    t_scan = os.environ.get("GSL_FAST_TRANSMIT", "matmul") == "scan"
    s_mxu = os.environ.get("GSL_FAST_SIGMA", "vpu") == "mxu"
    rel = os.environ.get("GSL_FAST_RELMEANS", "0") != "0"
    return t_scan, s_mxu, rel


def _centered_pixel_coords(tile_size):
    """Tile-CENTER-relative pixel coords [P, 1] (the frame of the fast
    path's rel_means payload): identical alpha/gradient arithmetic to
    absolute coords since only dx = mean - pixel enters, and both are
    shifted by the same tile center. Constant per kernel instance."""
    P = tile_size * tile_size
    p = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    half = jnp.float32(tile_size) * 0.5
    px = (p % tile_size).astype(jnp.float32) + 0.5 - half
    py = (p // tile_size).astype(jnp.float32) + 0.5 - half
    return px, py


def _cumprod_excl(v):
    """Exclusive cumulative product along lanes: out[p, i] = prod_{j<i} v[p, j].

    Hillis-Steele doubling scan — log2(K) statically-shifted multiplies on
    the VPU (K=128 -> 7). Replaces the fast path's log1p -> triangle-matmul
    -> exp transmittance closure: no transcendentals, no MXU pass; the only
    difference from the sequential product is multiply association order
    (few-ulp class). NOTES_ROUND4 lever 1.
    """
    P, K = v.shape
    one = jnp.ones((P, 1), v.dtype)
    x = jnp.concatenate([one, v[:, :K - 1]], axis=1)
    s = 1
    while s < K:
        x = x * jnp.concatenate(
            [jnp.ones((P, s), v.dtype), x[:, :K - s]], axis=1)
        s *= 2
    return x


def _cumprod_incl_rev(v):
    """Reverse inclusive cumulative product: out[p, i] = prod_{j>=i} v[p, j].

    Same doubling scan as `_cumprod_excl`, shifted from the right; lane 0
    holds the product of the whole chunk (the backward walk's carry
    update)."""
    P, K = v.shape
    x = v
    s = 1
    while s < K:
        x = x * jnp.concatenate(
            [x[:, s:], jnp.ones((P, s), v.dtype)], axis=1)
        s *= 2
    return x


def _window_before(vals, d, chunk):
    """Per-pixel within-window ordered sum (StopThePop resort primitive).

    vals/d: [P, chunk]. Windows are aligned groups of STP_WINDOW lanes.
    Returns S[p, i] = sum over j in i's window with precedes(j, i) of
    vals[p, j], where precedes(j, i) := d_j < d_i, ties broken by lane
    index (stable). Implemented as 2x(W-1) statically-shifted masked adds
    on the VPU — the 16-wide variant costs ~2-4x of the touched terms
    only (full-chunk 128-wide resort measured ~30x, NOTES design).
    """
    P = vals.shape[0]
    W = STP_WINDOW
    lane = lax.broadcasted_iota(jnp.int32, (1, chunk), 1) % W
    zpad = jnp.zeros((P, W), vals.dtype)
    vp = jnp.concatenate([zpad, vals, zpad], axis=1)      # [P, chunk + 2W]
    dp = jnp.concatenate([zpad, d, zpad], axis=1)
    out = jnp.zeros_like(vals)
    for o in range(1, W):
        # j = i - o (earlier lane, same window): tie -> j precedes
        v_r = vp[:, W - o:W - o + chunk]
        d_r = dp[:, W - o:W - o + chunk]
        out += jnp.where((lane >= o) & (d_r <= d), v_r, 0.0)
        # j = i + o (later lane, same window): strictly smaller d precedes
        v_l = vp[:, W + o:W + o + chunk]
        d_l = dp[:, W + o:W + o + chunk]
        out += jnp.where((lane < W - o) & (d_l < d), v_l, 0.0)
    return out


def _stp_depths(stp_blk, dx, dy):
    """Per-pixel conditional depth E[z | xy]: d_p = depth + kz.(p - mean)
    = depth - kz.(mean - p), reusing _alphas' dx/dy."""
    depth = stp_blk[0:1, :]
    kzx = stp_blk[1:2, :]
    kzy = stp_blk[2:3, :]
    return depth - kzx * dx - kzy * dy


def _fwd_kernel(
    blk_ref, tile_ref, flags_ref,
    *refs,
    tiles_x: int, tile_size: int, sb: int, chunk: int, n_channels: int,
    fast: bool, stp: bool = False, t_scan: bool = False,
    s_mxu: bool = False, rel: bool = False,
):
    if stp:
        (geom_ref, color_ref, stp_ref, out_ref, tfin_ref, istop_ref,
         acc, T, istop, alldone) = refs
    else:
        (geom_ref, color_ref, out_ref, tfin_ref, istop_ref,
         acc, T, istop, alldone) = refs
    prec = lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
    k = pl.program_id(0)
    tile = tile_ref[k]
    valid, first, last, lo, hi = _unpack(flags_ref[k])
    P = tile_size * tile_size
    W = STP_WINDOW

    @pl.when(first)
    def _():
        acc[...] = jnp.zeros_like(acc)
        T[...] = jnp.ones_like(T)
        istop[...] = jnp.full_like(istop, BIG_I32)
        alldone[0] = 0

    @pl.when(valid & (alldone[0] == 0))
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        if fast and not stp:
            # rel: geom means are tile-center-relative (expand rel_means);
            # otherwise f32 absolute means ride the sort (round-3 layout)
            cxk = cyk = None
            if not rel:
                ts_f = jnp.float32(tile_size)
                cxk = (tile % tiles_x).astype(jnp.float32) * ts_f \
                    + 0.5 * ts_f
                cyk = (tile // tiles_x).astype(jnp.float32) * ts_f \
                    + 0.5 * ts_f
            if s_mxu:
                basis_hi, basis_lo = _moment_basis(tile_size)
            elif rel:
                pxc, pyc = _centered_pixel_coords(tile_size)
            else:
                pxc, pyc = px, py
        base0 = blk_ref[k] * sb
        i0 = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        i1 = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        # with the per-pixel resort, the across-window order is the global
        # key order (strict window-level triangle); within a window the
        # order is data-dependent per pixel (_window_before)
        tri = ((i0 // W < i1 // W) if stp else (i0 < i1)).astype(
            jnp.float32)
        # [1, K] lane math: the range masks depend only on the lane, so
        # they are [1, chunk] rows broadcast into the single [P, K] mask
        # select — not materialized at [P, K]
        lane1 = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        # inner walk over sub-chunks of the stream block (unrolled; the
        # grid step count — and its DMA/launch overhead — is amortized 8x).
        # Each sub-chunk is predicated on overlapping the tile's [lo, hi)
        # range so a tile only pays for ceil(count/chunk) sub-chunks.
        for j in range(sb // chunk):
            @pl.when((j * chunk < hi) & ((j + 1) * chunk > lo))
            def _(j=j):
                sl = slice(j * chunk, (j + 1) * chunk)
                if fast and not stp:
                    # dx/dy are only needed by the stp depth planes
                    if s_mxu:
                        a, _, _ = _alphas_mxu(geom_ref[:, sl], basis_hi,
                                              basis_lo, cxk, cyk)
                    else:
                        a, _, _, *_ = _alphas(geom_ref[:, sl], pxc, pyc,
                                              check_sigma=False)
                    dx = dy = None
                else:
                    a, _, _, dx, dy, *_ = _alphas(geom_ref[:, sl], px, py,
                                                  check_sigma=not fast)
                idx = base0 + j * chunk + lane1            # [1, K]
                lane_sb = j * chunk + lane1
                in_rng = (lane_sb >= lo) & (lane_sb < hi)  # [1, K]
                if not stp:
                    in_rng = in_rng & (idx < istop[...])   # [P, K]
                a = jnp.where(in_rng, a, 0.0)

                if fast and not stp and t_scan:
                    # transcendental-free closure: exclusive cumprod scan
                    # (7 shifted multiplies) instead of log1p -> triangle
                    # matmul -> exp; same sequential-product semantics up
                    # to multiply association order (NOTES_ROUND4 lever 1)
                    v = 1.0 - a
                    E = _cumprod_excl(v)
                    I_inc = E * v                  # inclusive cumprod
                    T_exc = T[...] * E
                    T_inc = T[...] * I_inc
                    alive_m = T_inc > MIN_TRANSMITTANCE
                    w = jnp.where(alive_m, a * T_exc, 0.0)
                    # chunk product over the alive prefix = the smallest
                    # alive inclusive cumprod (I_inc is non-increasing);
                    # Mosaic has no reduce_prod, min is the same value here
                    T[...] = T[...] * jnp.min(
                        jnp.where(alive_m, I_inc, 1.0), axis=1,
                        keepdims=True)
                else:
                    lf = jnp.log1p(-a)                     # a==0 -> lf==0
                    S_exc = jnp.dot(lf, tri,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    if stp:
                        dpp = _stp_depths(stp_ref[:, sl], dx, dy)
                        S_exc = S_exc + _window_before(lf, dpp, chunk)
                    T_exc = T[...] * jnp.exp(S_exc)

                    if stp:
                        # no transmittance break in resort mode: "first
                        # break index" is order-dependent, which is exactly
                        # what STP removes; weights below MIN_TRANSMITTANCE
                        # vanish on their own (T underflows toward 0
                        # harmlessly)
                        w = a * T_exc
                        lf_eff = lf
                    else:
                        T_inc = T_exc * (1.0 - a)
                        # w/lf_eff need only the transmittance-alive mask:
                        # a == 0 already zeroes both (lf = log1p(0) = 0)
                        alive_m = T_inc > MIN_TRANSMITTANCE
                        w = jnp.where(alive_m, a * T_exc, 0.0)
                        lf_eff = jnp.where(alive_m, lf, 0.0)
                    T[...] = T[...] * jnp.exp(
                        jnp.sum(lf_eff, axis=1, keepdims=True))
                acc[...] += jnp.dot(w, color_ref[:, sl].T,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                if not stp:
                    brk = (T_inc <= MIN_TRANSMITTANCE) & (a > 0.0)
                    first_brk = jnp.min(jnp.where(brk, idx, BIG_I32),
                                        axis=1, keepdims=True)
                    istop[...] = jnp.minimum(istop[...], first_brk)
        if not stp:
            alldone[0] = jnp.all(istop[...] < BIG_I32).astype(jnp.int32)

    @pl.when(last)
    def _():
        out_ref[0] = acc[...]
        tfin_ref[0, 0] = T[...][:, 0]
        istop_ref[0, 0] = istop[...][:, 0]


def _rasterize_fwd_raw(geom_s, color_s, sched: ChunkSchedule,
                       n_tiles, tiles_x, tile_size, sb, chunk, interpret,
                       fast=False, stp_s=None):
    C = color_s.shape[0]
    G = sched.blk.shape[0]
    P = tile_size * tile_size
    stp = stp_s is not None

    in_specs = [
        pl.BlockSpec((8, sb), lambda k, b, t, f: (0, b[k])),
        pl.BlockSpec((C, sb), lambda k, b, t, f: (0, b[k])),
    ]
    inputs = [geom_s, color_s]
    if stp:
        in_specs.append(pl.BlockSpec((8, sb), lambda k, b, t, f: (0, b[k])))
        inputs.append(stp_s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, P, C), lambda k, b, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda k, b, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda k, b, t, f: (t[k], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, C), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    t_scan, s_mxu, rel = _fast_closure_modes()
    out, tfin, istop = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, tile_size=tile_size,
                          sb=sb, chunk=chunk, n_channels=C, fast=fast,
                          stp=stp, t_scan=t_scan, s_mxu=s_mxu, rel=rel),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, P, C), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32),
        ],
        interpret=interpret,
    )(sched.blk, sched.tile_of_chunk, sched.flags, *inputs)
    return out, tfin, istop


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    blk_ref, tile_ref, flags_ref, rvflag_ref,
    *refs,
    tiles_x: int, tile_size: int, sb: int, chunk: int, n_channels: int,
    stp: bool = False, fast: bool = False, t_scan: bool = False,
    s_mxu: bool = False, rel: bool = False,
):
    if stp:
        (geom_ref, color_ref, stp_ref, gout_ref, galpha_ref, tfin_ref,
         istop_ref, dgeom_ref, dcolor_ref, T_run, Sg, max_istop) = refs
    else:
        (geom_ref, color_ref, gout_ref, galpha_ref, tfin_ref, istop_ref,
         dgeom_ref, dcolor_ref, T_run, Sg, max_istop) = refs
    k = pl.program_id(0)
    pos = pl.num_programs(0) - 1 - k
    tile = tile_ref[pos]
    valid, first, last, lo, hi = _unpack(flags_ref[pos])
    # rvflag: 1 when this is the FIRST walk visit of a block that will be
    # revisited by the next step (tile boundary) -> later visit must merge
    fresh = rvflag_ref[pos] == 0
    P = tile_size * tile_size

    @pl.when(last)
    def _():
        tf = tfin_ref[0, 0][:, None]
        galpha = galpha_ref[0, 0][:, None]
        Sg[...] = -tf * galpha
        T_run[...] = tf
        max_istop[0] = jnp.max(
            jnp.minimum(istop_ref[0, 0], BIG_I32 - 1)) + 1

    base0 = blk_ref[pos] * sb
    active = valid & (base0 < max_istop[0])

    dgeom_prev = dgeom_ref[...]
    dcolor_prev = dcolor_ref[...]

    @pl.when(active)
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        if fast:
            # the moment-matmul gradient path always needs the basis; the
            # centered coords only feed the vpu-sigma alpha evaluation
            basis_hi, basis_lo = _moment_basis(tile_size)
            ts_f = jnp.float32(tile_size)
            cxk = (tile % tiles_x).astype(jnp.float32) * ts_f + 0.5 * ts_f
            cyk = (tile // tiles_x).astype(jnp.float32) * ts_f + 0.5 * ts_f
            if not stp and not s_mxu:
                pxc, pyc = (_centered_pixel_coords(tile_size) if rel
                            else (px, py))
        g = gout_ref[0]                               # [P, C]
        lane1 = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        i0 = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        i1 = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        W = STP_WINDOW
        # stp: across-window order is the key order; within a window the
        # per-pixel resort replaces the triangles with _window_before sums
        tri_ge = ((i0 // W >= i1 // W) if stp else (i0 >= i1)).astype(
            jnp.float32)
        tri_gt = ((i0 // W >= i1 // W) if stp else (i0 > i1)).astype(
            jnp.float32)
        istop_col = istop_ref[0, 0][:, None]
        prec = lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST

        # reverse inner walk over the sub-chunks of the stream block; each
        # sub-chunk predicated on overlapping [lo, hi) — skipped ones only
        # need their output region initialized on a fresh block visit
        for j in reversed(range(sb // chunk)):
            sl = slice(j * chunk, (j + 1) * chunk)
            touches = (j * chunk < hi) & ((j + 1) * chunk > lo)

            @pl.when(touches)
            def _(j=j, sl=sl):
                if fast and not stp:
                    # dx/dy/sigma are not consumed by the fast gradient
                    # path (moments replace them); with rel, geom means
                    # are tile-center-relative (expand rel_means)
                    if s_mxu:
                        a, keep, raw = _alphas_mxu(
                            geom_ref[:, sl], basis_hi, basis_lo,
                            None if rel else cxk, None if rel else cyk)
                    else:
                        a, keep, raw, *_ = _alphas(
                            geom_ref[:, sl], pxc, pyc, check_sigma=False)
                    dx = dy = sigma = ca = cb = cc = op = None
                else:
                    a, keep, raw, dx, dy, ca, cb, cc, op, sigma = _alphas(
                        geom_ref[:, sl], px, py, check_sigma=not fast)
                lane_sb = j * chunk + lane1                # [1, K]
                idx = base0 + lane_sb
                in_rng = (lane_sb >= lo) & (lane_sb < hi)  # [1, K]
                comp = keep & (in_rng & (idx < istop_col))
                a = jnp.where(comp, a, 0.0)

                if fast and not stp and t_scan:
                    # transcendental-free suffix closure (see _fwd_kernel):
                    # R[i] = prod_{j>=i}(1-a_j) via reverse doubling scan;
                    # T_exc = T_run / R replaces log1p -> matmul -> exp.
                    # tiny/tiny division is no worse conditioned than the
                    # tiny*exp(huge) product it replaces.
                    v = 1.0 - a
                    R = _cumprod_incl_rev(v)
                    T_exc = T_run[...] / R
                else:
                    lf = jnp.log1p(-a)
                    S_inc = jnp.dot(lf, tri_ge,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    if stp:
                        dpp = _stp_depths(stp_ref[:, sl], dx, dy)
                        lf_before = _window_before(lf, dpp, chunk)
                        # S_inc must sum lf over slots NOT preceding i
                        # (incl. i): full >=-window sum minus the
                        # within-window predecessors
                        S_inc = S_inc - lf_before
                    T_exc = T_run[...] * jnp.exp(-S_inc)

                colors = color_ref[:, sl]             # [C, K]
                cg = jnp.dot(g, colors,
                             preferred_element_type=jnp.float32,
                             precision=prec)

                q = a * T_exc * cg
                Sq_strict = jnp.dot(q, tri_gt,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                if stp:
                    # strictly-after sum: full >=-window sum minus self
                    # minus the within-window predecessors
                    Sq_strict = Sq_strict - q - _window_before(q, dpp,
                                                               chunk)
                Sg_i = Sg[...] + Sq_strict

                one_minus = jnp.maximum(1.0 - a, 1e-3)
                dalpha = jnp.where(comp, T_exc * cg - Sg_i / one_minus, 0.0)

                w = a * T_exc
                dcol = lax.dot_general(
                    g, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)  # [C, K]

                not_clamped = raw < MAX_ALPHA
                dsigma = jnp.where(not_clamped, -a * dalpha, 0.0)

                if fast:
                    # moment matmul: all six gradient rows are linear in
                    # the degree-2 pixel moments of dsigma (S0, S1x, S1y,
                    # S2xx, S2xy, S2yy) — two bf16 MXU matmuls against
                    # the exactly-split tile-center basis replace ~16 VPU
                    # passes over [P, K] (ddx/ddy products + six sublane
                    # reductions). dsigma rides in bf16: the same 2^-9
                    # per-slot rounding class the fast path already
                    # accepts for the grad rows packed through the sort.
                    ds16 = dsigma.astype(jnp.bfloat16)
                    mom = (lax.dot_general(
                        basis_hi, ds16, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT)
                        + lax.dot_general(
                            basis_lo, ds16, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.DEFAULT))  # [8, K]
                    # moment recombination is in the tile-center frame
                    if rel and not stp:  # rel_means: already centered
                        xc = geom_ref[0:1, sl]
                        yc = geom_ref[1:2, sl]
                    else:
                        xc = geom_ref[0:1, sl] - cxk
                        yc = geom_ref[1:2, sl] - cyk
                    ca1 = geom_ref[2:3, sl]
                    cb1 = geom_ref[3:4, sl]
                    cc1 = geom_ref[4:5, sl]
                    s0 = mom[0:1, :]
                    s1x = mom[1:2, :]
                    s1y = mom[2:3, :]
                    gx = xc * s0 - s1x                 # sum dsigma*dx
                    gy = yc * s0 - s1y
                    dmx = ca1 * gx + cb1 * gy
                    dmy = cb1 * gx + cc1 * gy
                    # sum dsigma*dx^2 = xc^2*S0 - 2*xc*S1x + S2xx, etc.
                    da = 0.5 * (xc * xc * s0 - 2.0 * xc * s1x
                                + mom[3:4, :])
                    db = (xc * yc * s0 - xc * s1y - yc * s1x
                          + mom[4:5, :])
                    dc = 0.5 * (yc * yc * s0 - 2.0 * yc * s1y
                                + mom[5:6, :])
                    # dop integrand dalpha*exp(-sigma) = -dsigma/op
                    dop = -s0 / jnp.maximum(geom_ref[5:6, sl], 1e-30)
                    dg_new = jnp.concatenate(
                        [dmx, dmy, da, db, dc, dop], axis=0)  # [6, K]
                else:
                    dop_el = jnp.where(not_clamped & comp,
                                       dalpha * jnp.exp(-sigma), 0.0)
                    ddx = dsigma * (ca * dx + cb * dy)
                    ddy = dsigma * (cc * dy + cb * dx)
                    dg_new = jnp.concatenate([
                        jnp.sum(ddx, axis=0, keepdims=True),
                        jnp.sum(ddy, axis=0, keepdims=True),
                        jnp.sum(dsigma * 0.5 * dx * dx, axis=0,
                                keepdims=True),
                        jnp.sum(dsigma * dx * dy, axis=0, keepdims=True),
                        jnp.sum(dsigma * 0.5 * dy * dy, axis=0,
                                keepdims=True),
                        jnp.sum(dop_el, axis=0, keepdims=True),
                    ], axis=0)                         # [6, K]

                # |dmx|/|dmy| (AbsGS) are per-(tile,gaussian) = per-slot:
                # they are recovered as abs of these rows post-sort

                lane1_sb = j * chunk + lane1
                in1 = (lane1_sb >= lo) & (lane1_sb < hi)
                dgeom_ref[:, sl] = jnp.where(
                    in1, dg_new, jnp.where(fresh, 0.0, dgeom_prev[:, sl]))
                dcolor_ref[:, sl] = jnp.where(
                    in1, dcol, jnp.where(fresh, 0.0, dcolor_prev[:, sl]))

                if fast and not stp and t_scan:
                    # R's lane 0 is the whole-chunk product
                    T_run[...] = T_run[...] / R[:, 0:1]
                else:
                    T_run[...] = T_run[...] * jnp.exp(
                        -jnp.sum(lf, axis=1, keepdims=True))
                Sg[...] = Sg[...] + jnp.sum(q, axis=1, keepdims=True)

            @pl.when(jnp.logical_not(touches) & fresh)
            def _(sl=sl):
                dgeom_ref[:, sl] = jnp.zeros((6, chunk), jnp.float32)
                dcolor_ref[:, sl] = jnp.zeros(
                    (n_channels, chunk), jnp.float32)

    # inactive fresh block: initialize outputs; inactive revisit: the block
    # buffer already holds the previous visit's content — leave it
    @pl.when(jnp.logical_not(active) & fresh)
    def _():
        dgeom_ref[...] = jnp.zeros_like(dgeom_prev)
        dcolor_ref[...] = jnp.zeros_like(dcolor_prev)


def _rasterize_bwd_raw(geom_s, color_s, gout, galpha, tfin, istop,
                       sched: ChunkSchedule, n_tiles, tiles_x, tile_size,
                       sb, chunk, interpret, stp_s=None, fast=False):
    C = color_s.shape[0]
    G = sched.blk.shape[0]
    P = tile_size * tile_size
    capacity = geom_s.shape[1]
    stp = stp_s is not None

    # walk-order revisit flag: in the REVERSED walk, chunk at pos is a
    # non-first visit of its block when pos+1 (visited just before) shares it
    rv = jnp.concatenate([
        (sched.blk[:-1] == sched.blk[1:]).astype(jnp.int32),
        jnp.zeros((1,), jnp.int32)], axis=0)

    def rev(idx_fn):
        return lambda k, b, t, f, r: idx_fn(G - 1 - k, b, t)

    in_specs = [
        pl.BlockSpec((8, sb), rev(lambda p, b, t: (0, b[p]))),
        pl.BlockSpec((C, sb), rev(lambda p, b, t: (0, b[p]))),
    ]
    inputs = [geom_s, color_s]
    if stp:
        in_specs.append(pl.BlockSpec((8, sb), rev(lambda p, b, t:
                                                  (0, b[p]))))
        inputs.append(stp_s)
    in_specs += [
        pl.BlockSpec((1, P, C), rev(lambda p, b, t: (t[p], 0, 0))),
        pl.BlockSpec((1, 1, P), rev(lambda p, b, t: (t[p], 0, 0))),
        pl.BlockSpec((1, 1, P), rev(lambda p, b, t: (t[p], 0, 0))),
        pl.BlockSpec((1, 1, P), rev(lambda p, b, t: (t[p], 0, 0))),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((6, sb), rev(lambda p, b, t: (0, b[p]))),
            pl.BlockSpec((C, sb), rev(lambda p, b, t: (0, b[p]))),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),   # T_run
            pltpu.VMEM((P, 1), jnp.float32),   # Sg carry
            pltpu.SMEM((1,), jnp.int32),       # max istop (early exit)
        ],
    )
    t_scan, s_mxu, rel = _fast_closure_modes()
    dgeom, dcolor = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, tile_size=tile_size,
                          sb=sb, chunk=chunk, n_channels=C, stp=stp,
                          fast=fast, t_scan=t_scan, s_mxu=s_mxu, rel=rel),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((6, capacity), jnp.float32),
            jax.ShapeDtypeStruct((C, capacity), jnp.float32),
        ],
        # the STP-resort bwd peaks ~16.4M scoped vmem (the _window_before
        # shifted pads) — just over the 16M compiler default on a real chip
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(sched.blk, sched.tile_of_chunk, sched.flags, rv, *inputs,
      gout, galpha, tfin, istop)
    return dgeom, dcolor


# ---------------------------------------------------------------------------
# reduce kernel: gid-grouped slot gradients -> per-gaussian sums
# ---------------------------------------------------------------------------

def _reduce_kernel(
    g8_ref,                      # [n_blocks] i32 aligned window base / 8
    grads_ref, gid_ref,          # [R_pad, B], [1, B]
    out_hbm,                     # [n8 + RED_W/8, 128] flat (ANY memspace)
    partial, carry, sem,
    *, r_rows: int, fast: bool,
):
    """Windowed one-hot group-by over the gid-sorted gradient stream.

    The HBM output is FLAT: row r packs gaussians [8r, 8r+8) as 8 x 16-lane
    field groups, so the per-block DMA window ([RW, 128]) is tile-aligned
    (Mosaic requires 128-lane slices).  The whole shifted window rides the
    sequential grid as the carry, so later blocks overwrite earlier rows
    with identical-or-more-complete sums — last write wins."""
    b = pl.program_id(0)
    B = RED_B
    W = RED_W
    RW = RED_W // 8
    R_pad = TABLE_D
    g_base = g8_ref[b] * 8

    # one-hot group-by: column = gid - g_base (bounded by B + 8 <= W since
    # every gaussian owns >= 1 slot and the base is aligned down by < 8)
    # under fast mode the gradient rows already passed through bf16 packing,
    # so default (bf16-input) matmul precision loses nothing extra; the
    # one-hot operand is exact in bf16 either way
    prec = lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
    gid = gid_ref[...]                                  # [1, B] float
    w = gid.astype(jnp.int32) - g_base
    # factored one-hot: w = 8q + r. The flat output layout (row q, lane
    # group 16r) groups EXACTLY by (q, r), so summing per-(q, r) directly
    # — 8 masked copies of the grads + 8 small [B,RW]x[R_pad,B] matmuls —
    # both shrinks the one-hot compare 8x ([B, RW] instead of [B, W]) and
    # eliminates the whole relayout matmul cascade: the 8 per-r results
    # concatenate straight into the flat row.
    wq = (w // 8).reshape(B, 1)
    wr = (w % 8).reshape(B, 1)
    qidx = lax.broadcasted_iota(jnp.int32, (B, RW), 1)
    Q = (qidx == wq).astype(jnp.float32)                # [B, RW]
    cols = []
    for r in range(8):
        mask_r = (wr == r).astype(jnp.float32).reshape(1, B)
        Gr = grads_ref[...] * mask_r                    # [R_pad, B]
        sq = lax.dot_general(
            Q, Gr, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                             # [RW, R_pad]
        cols.append(sq)
    flat = jnp.concatenate(cols, axis=1)                # [RW, 128]

    @pl.when(b == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    # shift the previous window's partials down by the (row-aligned) window
    # advance and merge: new[i, :] = old[i + dr, :]
    dr = g8_ref[b] - g8_ref[jnp.maximum(b - 1, 0)]
    si = lax.broadcasted_iota(jnp.int32, (RW, RW), 0)
    sj = lax.broadcasted_iota(jnp.int32, (RW, RW), 1)
    S = (sj == si + dr).astype(jnp.float32)
    shifted = jnp.dot(S, carry[...], preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
    total = flat + shifted
    partial[...] = total
    carry[...] = total

    copy = pltpu.make_async_copy(
        partial, out_hbm.at[pl.ds(g8_ref[b], RW), :], sem)
    copy.start()
    copy.wait()


def _reduce_by_gid(dgeom, dcolor, gid_sorted, n, interpret, fast=False):
    """Per-gaussian sums of the per-slot gradient rows.

    Sorts (gid, grad rows) so each gaussian's slots are contiguous, then a
    windowed one-hot matmul closes each group; the shifted window partial
    rides the sequential grid as a carry and finished rows are (re)written
    flat, 8 gaussians per 128-lane row. With `fast`, the conic/opacity/color
    gradient rows ride the sort as packed bf16 pairs (dmx/dmy stay f32 —
    they drive the densification statistics)."""
    R = 2 + dgeom.shape[0] + dcolor.shape[0]    # + the 2 recovered abs rows
    capacity = dgeom.shape[1]
    R_pad = TABLE_D

    grad_rows = list(dgeom) + list(dcolor)      # dmx dmy da db dc dop ch..
    if fast:
        # second-level packing (round-3 lever c): dmx/dmy ride bf16 too —
        # one fewer sort operand; the 2^-9 per-slot rounding matches the
        # class the fast path already accepts for the other gradient rows
        # (the densify statistic is a 100-step accumulated norm, far above
        # this noise floor — quality gate: tools/quality_benchmark.py
        # fast-vs-exact)
        payload = _pack_rows(grad_rows)
        ops = lax.sort((gid_sorted,) + tuple(payload), num_keys=1,
                       is_stable=True)
        gid2 = ops[0]
        sorted_rows = _unpack_rows(ops[1:], len(grad_rows))
    else:
        ops = lax.sort((gid_sorted,) + tuple(grad_rows), num_keys=1,
                       is_stable=True)
        gid2 = ops[0]
        sorted_rows = list(ops[1:])
    # AbsGS |d means2d| is a per-slot statistic: rebuild it from the sorted
    # dmx/dmy rows (elementwise) instead of carrying 2 extra sort operands
    rows = jnp.stack(
        sorted_rows[:6] + [jnp.abs(sorted_rows[0]), jnp.abs(sorted_rows[1])]
        + sorted_rows[6:] + [jnp.zeros((capacity,), jnp.float32)]
        * (R_pad - R), axis=0)                          # [R_pad, cap]

    return _reduce_sorted_rows(rows, gid2, n, interpret, fast)[:, :R]


# (A scatter-based reduce variant — inverse-permute gradients back to
# expansion order via one int scatter + row gather instead of the gid sort —
# was measured SLOWER on the live v5e in round 3 (GSL_SCATTER_REDUCE,
# NOTES_ROUND3.md): the [cap, 16]-row gather runs at gather speed. Removed
# in round 4; see git history for the code.)


def _reduce_sorted_rows(rows, gid2, n, interpret, fast=False):
    """Windowed one-hot group-by of gid-SORTED rows [R_pad<=16, cap] ->
    per-gaussian sums [N, R_pad]. Shared by the 3DGS and surfel reduces;
    callers with more than 16 gradient rows sort once and invoke this per
    16-row group."""
    R_pad, capacity = rows.shape
    assert R_pad == TABLE_D
    B = RED_B
    RW = RED_W // 8
    n_blocks = capacity // B
    g_lo = jnp.clip(gid2[::B].astype(jnp.int32), 0, n)
    g8 = g_lo // 8                                      # aligned base / 8

    n8 = -(-n // 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R_pad, B), lambda k, g: (0, k)),
            pl.BlockSpec((1, B), lambda k, g: (0, k)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((RW, 128), jnp.float32),
            pltpu.VMEM((RW, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, r_rows=R_pad, fast=fast),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8 + RW, 128), jnp.float32),
        interpret=interpret,
    )(g8, rows, gid2[None, :])
    return out[:n8].reshape(n8 * 8, R_pad)[:n]          # [N, R_pad]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _tiles_to_image(x_tPC, tiles_y, tiles_x, ts, H, W):
    C = x_tPC.shape[-1]
    img = x_tPC.reshape(tiles_y, tiles_x, ts, ts, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, C)
    return img[:H, :W]


def _image_to_tiles(img, tiles_y, tiles_x, ts):
    H, W = img.shape[:2]
    C = img.shape[2] if img.ndim == 3 else 1
    img = img.reshape(H, W, C)
    pad_h = tiles_y * ts - H
    pad_w = tiles_x * ts - W
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    img = img.reshape(tiles_y, ts, tiles_x, ts, C).transpose(0, 2, 1, 3, 4)
    return img.reshape(tiles_y * tiles_x, ts * ts, C)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15))
def rasterize_pallas(means2d, conics, opacities, channels, absgrad_tap,
                     isects, img_height, img_width, tile_size=16, chunk=128,
                     interpret=False, capacity=None,
                     tile_based_culling=False, fast=False,
                     stp_resort=False, exact_sort=False):
    """Rasterize with the Pallas TPU kernels.

    Returns (channels_img [H, W, C] WITHOUT background blending,
             alpha [H, W]). Apply background as
    `img + (1 - alpha)[..., None] * bg` (differentiable in XLA).

    `absgrad_tap` [N, 2] zeros: its cotangent is the AbsGS statistic —
    sum over tiles of |per-(tile,gaussian) means2d gradient| (same
    granularity as gsplat's in-kernel absgrad accumulation).

    `capacity` (static) is the expansion slot budget; defaults to the
    smallest multiple of 512 >= 4N.
    """
    out, _ = _fwd_impl(means2d, conics, opacities, channels, isects,
                       img_height, img_width, tile_size, chunk, interpret,
                       capacity, tile_based_culling, fast, stp_resort,
                       exact_sort)
    return out


def _resolve_capacity(n, capacity):
    if capacity is None:
        capacity = 4 * n
    # all three block sizes are powers of two, so the max is their lcm
    blk = max(STREAM_BLOCK, RED_B, EXPAND_BLOCK)
    capacity = -(-capacity // blk) * blk
    # the f32 offset pipeline (_cumsum_mxu offsets, searchsorted windows,
    # f32 table rows) is exact only for slot ids < 2^24; fit.py grows
    # capacity 1.5x on dropped isects, so fail loudly at the contract
    # boundary instead of silently corrupting expansion windows (ADVICE r4)
    if capacity >= 1 << 24:
        raise ValueError(
            f"isect slot capacity {capacity} >= 2^24 exceeds the exact-f32"
            " offset range; shard the scene (partitioning/MP) instead")
    return capacity


def _fwd_impl(means2d, conics, opacities, channels, isects,
              img_height, img_width, tile_size, chunk, interpret,
              capacity, tile_based_culling, fast=False, stp_resort=False,
              exact_sort=False):
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    n = means2d.shape[0]
    capacity = _resolve_capacity(n, capacity)
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    depth_bits = 32 - tile_bits

    with jax.named_scope("gs_expand_sort"):
        sorted_keys, gid_sorted, geom_s, color_s, stp_s = \
            _expand_sorted(
                means2d, conics, opacities, channels, isects, capacity,
                tile_size, tiles_x, tiles_y, depth_bits,
                tile_based_culling, interpret, fast, stp_resort,
                exact_sort=exact_sort)
    with jax.named_scope("gs_schedule"):
        sched = _build_schedule(sorted_keys, n_tiles, depth_bits, capacity,
                                STREAM_BLOCK)
    with jax.named_scope("gs_raster_fwd"):
        out_t, tfin_t, istop_t = _rasterize_fwd_raw(
            geom_s, color_s, sched, n_tiles, tiles_x, tile_size,
            STREAM_BLOCK, chunk, interpret, fast, stp_s)

    empty = (sched.tile_counts == 0)
    out_t = jnp.where(empty[:, None, None], 0.0, out_t)
    tfin_t = jnp.where(empty[:, None, None], 1.0, tfin_t)
    istop_t = jnp.where(empty[:, None, None], BIG_I32, istop_t)
    ts = tile_size
    out = _tiles_to_image(out_t, tiles_y, tiles_x, ts, img_height, img_width)
    alpha = _tiles_to_image(1.0 - tfin_t.transpose(0, 2, 1), tiles_y,
                            tiles_x, ts, img_height, img_width)[..., 0]
    # real slot count (invalid keys sort to the end): positions past it in
    # the gradient streams are never written by the kernels
    n_real = jnp.searchsorted(
        sorted_keys,
        jnp.uint32(n_tiles) << depth_bits).astype(jnp.int32)
    res = (geom_s, color_s, stp_s, gid_sorted, sched, tfin_t, istop_t,
           n_real, n)
    return (out, alpha), res


def _rasterize_fwd(means2d, conics, opacities, channels, absgrad_tap,
                   isects, img_height, img_width, tile_size, chunk,
                   interpret, capacity, tile_based_culling, fast,
                   stp_resort, exact_sort):
    (out, alpha), res = _fwd_impl(
        means2d, conics, opacities, channels, isects, img_height, img_width,
        tile_size, chunk, interpret, capacity, tile_based_culling, fast,
        stp_resort, exact_sort)
    return (out, alpha), res + (isects,)


def _rasterize_bwd(img_height, img_width, tile_size, chunk, interpret,
                   capacity, tile_based_culling, fast, stp_resort,
                   exact_sort, res, cotangents):
    (geom_s, color_s, stp_s, gid_sorted, sched, tfin_t, istop_t, n_real, n,
     isects) = res
    g_out, g_alpha = cotangents
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    ts = tile_size

    gout_t = _image_to_tiles(g_out, tiles_y, tiles_x, ts)
    galpha_t = _image_to_tiles(g_alpha, tiles_y, tiles_x,
                               ts).transpose(0, 2, 1)
    with jax.named_scope("gs_raster_bwd"):
        dgeom_s, dcolor_s = _rasterize_bwd_raw(
            geom_s, color_s, gout_t, galpha_t, tfin_t, istop_t, sched,
            n_tiles, tiles_x, ts, STREAM_BLOCK, chunk, interpret, stp_s,
            fast)

    # zero the never-written garbage past the real slots
    capacity_r = geom_s.shape[1]
    pos = jnp.arange(capacity_r, dtype=jnp.int32)
    live = (pos < n_real)[None, :]
    dgeom_s = jnp.where(live, dgeom_s, 0.0)
    dcolor_s = jnp.where(live, dcolor_s, 0.0)

    with jax.named_scope("gs_grad_reduce"):
        summed = _reduce_by_gid(dgeom_s, dcolor_s, gid_sorted, n,
                                interpret, fast)
    # gaussians truncated entirely out of the slot budget have no window in
    # the reduce pass: their output rows are uninitialized -> zero them
    summed = jnp.where((isects.offsets < capacity_r)[:, None], summed, 0.0)
    d_means2d = summed[:, 0:2]
    d_conics = summed[:, 2:5]
    d_opac = summed[:, 5]
    d_abstap = summed[:, 6:8]
    d_channels = summed[:, 8:]

    def zero_like(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros(jnp.shape(x), x.dtype)
        return np.zeros(np.shape(x), jax.dtypes.float0)

    d_isects = jax.tree.map(zero_like, isects)
    return d_means2d, d_conics, d_opac, d_channels, d_abstap, d_isects


rasterize_pallas.defvjp(_rasterize_fwd, _rasterize_bwd)


# ---------------------------------------------------------------------------
# debug helper (tests): XLA count of isects surviving peak-alpha culling
# ---------------------------------------------------------------------------

def count_culled_isects(projections, opacities, img_height, img_width,
                        tile_size):
    """Reference count of (gaussian, tile) pairs surviving StopThePop
    peak-alpha culling — O(N * max_rect), test-scale only."""
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    rect_min, rect_max = tile_rect(projections, tile_size, tiles_x, tiles_y)
    total = 0
    mn = np.asarray(rect_min)
    mx = np.asarray(rect_max)
    m2d = np.asarray(projections.means2d)
    con = np.asarray(projections.conics)
    op = np.asarray(opacities)
    for i in range(m2d.shape[0]):
        for ty in range(mn[i, 1], mx[i, 1]):
            for tx in range(mn[i, 0], mx[i, 0]):
                xlo = tx * tile_size - m2d[i, 0]
                xhi = xlo + tile_size
                ylo = ty * tile_size - m2d[i, 1]
                yhi = ylo + tile_size
                ca, cb, cc = con[i]

                def sig(dx, dy):
                    return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

                if xlo <= 0 <= xhi and ylo <= 0 <= yhi:
                    smin = 0.0
                else:
                    cands = []
                    for dx in (xlo, xhi):
                        dy = np.clip(-cb * dx / max(cc, 1e-12), ylo, yhi)
                        cands.append(sig(dx, dy))
                    for dy in (ylo, yhi):
                        dx = np.clip(-cb * dy / max(ca, 1e-12), xlo, xhi)
                        cands.append(sig(dx, dy))
                    smin = max(min(cands), 0.0)
                if op[i] * np.exp(-smin) >= 1.0 / 255.0:
                    total += 1
    return total

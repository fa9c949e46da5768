"""Pallas TPU surfel (2DGS) rasterizer: forward + hand-derived backward.

TPU-native replacement for the `diff-surfel-rasterization` CUDA extension
(/root/reference/internal/renderers/vanilla_2dgs_renderer.py:14-186) with
the exact compositing semantics of `ops/surfel.rasterize_surfels` (the XLA
oracle): perspective-correct ray-splat intersection via the homogeneous
plane-cross, screen-space low-pass (rho = min(rho3d, rho2d)), expected
depth, median depth (T crossing 0.5; forward-only, like the CUDA kernel's
TSDF use), and the incremental depth-distortion loss.

Maps onto the sort-centric pipeline of `rasterize_pallas` (same expand /
sort / schedule / stream kernels / windowed reduce), with a 19-lane
per-slot payload (Tu, Tv, Tw, zcoef: 12; opacity: 1; channels: C<=6) and
two extra chunk matmuls in each direction for the distortion prefix /
suffix accumulators (A = sum w, M1 = sum w*m, M2 = sum w*m^2).

Backward derivation (the part the CUDA kernel hand-codes; reproduced here
for the sorted-stream layout):
  dL/dw_i     = g.ch_i + gd*depth_i
                + gD * [(m_i^2 A_exc + M2_exc - 2 m_i M1_exc)      (own)
                      + (m_i^2 W_aft + M2_aft - 2 m_i M1_aft)]     (later)
  dL/dalpha_i = T_exc_i * dL/dw_i - Sg_i / (1 - a_i),
                Sg_i = sum_{j>i} w_j dL/dw_j - T_fin * galpha
  dL/ddepth_i = w_i gd + 2 gD w_i [m_i (A_exc+W_aft) - (M1_exc+M1_aft)]
                * dm/dd,   dm/dd = FAR*NEAR / ((FAR-NEAR) d^2)
then through G = exp(-rho/2), rho = min(rho3d, rho2d), the plane cross
s = hx x hy (dhx = hy x ds, dhy = ds x hx), and hx_i = px*T_i[2] - T_i[0],
hy_i = py*T_i[2] - T_i[1] into the nine T rows; depth = z0 + u zu + v zv
into zcoef. Exclusive prefixes are recovered in the reverse walk as
total - suffix - self using the forward's final accumulators.
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

from .rasterize_pallas import (BIG_F32, BIG_I32, EXPAND_BLOCK, RED_B,
                               STREAM_BLOCK, TABLE_D, WINDOW, ChunkSchedule,
                               PaddedIsects, _build_schedule,
                               _pixel_coords, _reduce_sorted_rows,
                               _searchsorted_vec, _tiles_to_image,
                               _image_to_tiles, _unpack)
from .rasterize_reference import ALPHA_THRESHOLD, MIN_TRANSMITTANCE
from .surfel import FAR_2D, FILTER_INV_SQUARE, MAX_ALPHA_2D, NEAR_2D

TABLE_DS = 32        # surfel table lanes: 5 meta + 13 geom + C (C <= 6)
N_GEOM_S = 13        # Tu(3) Tv(3) Tw(3) zc(3) op(1)


# ---------------------------------------------------------------------------
# expand kernel (surfel variant: wider table, no culling / stp)
# ---------------------------------------------------------------------------

def _expand_kernel_s(
    glo_ref, tot_ref,
    win0_ref, win1_ref,
    out_ref,
    *, n_channels: int, tiles_x: int, tiles_y: int, depth_bits: int,
):
    b = pl.program_id(0)
    B = EXPAND_BLOCK
    base_g = glo_ref[b] * B

    s = (b * B + lax.broadcasted_iota(jnp.int32, (1, B), 1)).astype(
        jnp.float32)

    offs0 = win0_ref[:, 0:1]
    offs1 = win1_ref[:, 0:1]
    cnt = (jnp.sum((offs0 <= s).astype(jnp.float32), axis=0, keepdims=True)
           + jnp.sum((offs1 <= s).astype(jnp.float32), axis=0,
                     keepdims=True))
    g_local = cnt - 1.0

    g_local_i = g_local.astype(jnp.int32)
    widx = lax.broadcasted_iota(jnp.int32, (B, B), 0)
    oh0 = (widx == g_local_i).astype(jnp.float32)
    oh1 = (widx == (g_local_i - B)).astype(jnp.float32)
    rowT = (lax.dot_general(win0_ref[...], oh0, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
            + lax.dot_general(win1_ref[...], oh1, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
            )                                          # [TABLE_DS, B]

    offs = rowT[0:1, :]
    rminx = rowT[1:2, :].astype(jnp.int32)
    rminy = rowT[2:3, :].astype(jnp.int32)
    w_signed = rowT[3:4, :].astype(jnp.int32)
    depth = rowT[4:5, :]

    local = (s - offs).astype(jnp.int32)
    w_use = jnp.maximum(w_signed, 1)
    t_y = jnp.minimum(rminy + local // w_use, tiles_y - 1)
    t_x = rminx + local % w_use
    tile = (t_y * tiles_x + t_x).astype(jnp.uint32)

    dbits = lax.bitcast_convert_type(jnp.maximum(depth, 0.0), jnp.uint32)
    key = (tile << depth_bits) | (dbits >> (32 - depth_bits))
    invalid = (w_signed < 0) | (s.astype(jnp.int32) >= tot_ref[0])
    key = jnp.where(invalid, jnp.uint32(0xFFFFFFFF), key)
    gid = jnp.float32(base_g) + g_local

    n_payload = N_GEOM_S + n_channels
    out_ref[0:1, :] = lax.bitcast_convert_type(key, jnp.float32)
    out_ref[1:2, :] = gid
    out_ref[2:2 + n_payload, :] = rowT[5:5 + n_payload, :]
    pad = TABLE_DS - 2 - n_payload
    if pad:
        out_ref[2 + n_payload:, :] = jnp.zeros((pad, B), jnp.float32)


def _expand_sorted_s(Tu, Tv, Tw, zcoef, opacities, channels, isects,
                     capacity, tiles_x, tiles_y, depth_bits, interpret):
    """Returns (sorted_keys u32, gid f32, surf_s [24, cap])."""
    n, c = channels.shape
    B = EXPAND_BLOCK
    assert capacity % B == 0
    assert c <= TABLE_DS - 5 - N_GEOM_S

    cols = ([isects.offsets.astype(jnp.float32),
             isects.rect_minx.astype(jnp.float32),
             isects.rect_miny.astype(jnp.float32),
             isects.rect_w_signed.astype(jnp.float32),
             isects.depths]
            + [Tu[:, i] for i in range(3)]
            + [Tv[:, i] for i in range(3)]
            + [Tw[:, i] for i in range(3)]
            + [zcoef[:, i] for i in range(3)]
            + [opacities]
            + [channels[:, i] for i in range(c)])
    cols += [jnp.zeros((n,), jnp.float32)] * (TABLE_DS - len(cols))
    table = jnp.stack(cols, axis=1)                    # [N, TABLE_DS]
    pad = jnp.zeros((WINDOW + B, TABLE_DS), jnp.float32)
    pad = pad.at[:, 0].set(BIG_F32).at[:, 3].set(-1.0)
    table = jnp.concatenate([table, pad], axis=0)

    n_blocks = capacity // B
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * B
    g_lo = jnp.clip(
        _searchsorted_vec(isects.offsets.astype(jnp.float32),
                          starts.astype(jnp.float32), side="right") - 1,
        0, n)
    glo_blk = g_lo // B
    total = jnp.minimum(isects.total_padded, capacity)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, TABLE_DS), lambda k, g, t: (g[k], 0)),
            pl.BlockSpec((B, TABLE_DS), lambda k, g, t: (g[k] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((TABLE_DS, B), lambda k, g, t: (0, k)),
    )
    rows = pl.pallas_call(
        functools.partial(
            _expand_kernel_s, n_channels=c, tiles_x=tiles_x,
            tiles_y=tiles_y, depth_bits=depth_bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TABLE_DS, capacity), jnp.float32),
        interpret=interpret,
    )(glo_blk, total[None].astype(jnp.int32), table, table)

    key = lax.bitcast_convert_type(rows[0], jnp.uint32)
    n_payload = N_GEOM_S + c
    sorted_ops = lax.sort((key,) + tuple(rows[1:2 + n_payload]),
                          num_keys=1, is_stable=True)
    sorted_keys = sorted_ops[0]
    gid_sorted = sorted_ops[1]
    n_rows = -(-(n_payload) // 8) * 8                  # sublane-pad to 8k
    surf_s = jnp.concatenate(
        [jnp.stack(list(sorted_ops[2:]), axis=0),
         jnp.zeros((n_rows - n_payload, capacity), jnp.float32)], axis=0)
    return sorted_keys, gid_sorted, surf_s


# ---------------------------------------------------------------------------
# per-slot surfel evaluation (shared fwd/bwd recompute)
# ---------------------------------------------------------------------------

def _surfel_terms(srows, px, py):
    """srows [R, K] payload block; px/py [P, 1] pixel centers.

    Returns a dict of [P, K] (or [1, K]) terms of the ray-splat solve."""
    Tu = [srows[i:i + 1, :] for i in range(0, 3)]
    Tv = [srows[i:i + 1, :] for i in range(3, 6)]
    Tw = [srows[i:i + 1, :] for i in range(6, 9)]
    zc = [srows[i:i + 1, :] for i in range(9, 12)]
    op = srows[12:13, :]
    T3 = [Tu, Tv, Tw]

    hx = [px * t[2] - t[0] for t in T3]               # [P, K] x3 (u, v, w)
    hy = [py * t[2] - t[1] for t in T3]
    sx = hx[1] * hy[2] - hx[2] * hy[1]
    sy = hx[2] * hy[0] - hx[0] * hy[2]
    sz = hx[0] * hy[1] - hx[1] * hy[0]
    sz_ok = jnp.abs(sz) >= 1e-12
    cz = jnp.where(sz_ok, sz, 1.0)
    u = sx / cz
    v = sy / cz
    rho3d = u * u + v * v

    twz = Tw[2]
    twz_s = jnp.where(twz == 0, 1.0, twz)
    cxp = Tw[0] / twz_s                                # [1, K]
    cyp = Tw[1] / twz_s
    dxp = px - cxp
    dyp = py - cyp
    rho2d = FILTER_INV_SQUARE * (dxp * dxp + dyp * dyp)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)

    # depth falls back to the CENTER depth when the 2D low-pass branch
    # wins (reference diff-surfel-rasterization forward.cu: depth =
    # use3d ? s.Tw + Tw.z : Tw.z). Besides semantics, this is the NaN
    # guard: a near-degenerate ray-splat solve (|sz| ~ 1e-12) puts u, v
    # at ~1e24 while the 2D filter keeps alpha alive — an unconditional
    # plane depth then reaches inf and 0*inf = NaN poisons the whole
    # backward chunk (round-5 gs2d quality NaN, NOTES_ROUND5)
    depth = jnp.where(use3d, zc[2] + u * zc[0] + v * zc[1], zc[2])
    G = jnp.exp(-0.5 * rho)
    raw = op * G
    alpha = jnp.minimum(MAX_ALPHA_2D, raw)
    keep = (alpha >= ALPHA_THRESHOLD) & sz_ok & (depth >= NEAR_2D)
    return dict(hx=hx, hy=hy, cz=cz, u=u, v=v, use3d=use3d, dxp=dxp,
                dyp=dyp, twz_s=twz_s, Tw=Tw, zc=zc, op=op, G=G, raw=raw,
                alpha=alpha, keep=keep, depth=depth)


def _map_depth(d):
    return (FAR_2D * (d - NEAR_2D)) / ((FAR_2D - NEAR_2D)
                                       * jnp.maximum(d, 1e-6))


def _dmap_ddepth(d):
    dm = FAR_2D * NEAR_2D / ((FAR_2D - NEAR_2D)
                             * jnp.maximum(d, 1e-6) ** 2)
    return jnp.where(d > 1e-6, dm, 0.0)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel_s(
    blk_ref, tile_ref, flags_ref,
    surf_ref,
    out_ref, aux_ref, istop_ref,
    acc, T, istop, dacc, med, found, dist, A1, M1, M2, alldone,
    *, tiles_x: int, tile_size: int, sb: int, chunk: int, n_channels: int,
    n_rows: int,
):
    k = pl.program_id(0)
    tile = tile_ref[k]
    valid, first, last, lo, hi = _unpack(flags_ref[k])
    P = tile_size * tile_size
    C = n_channels

    @pl.when(first)
    def _():
        acc[...] = jnp.zeros_like(acc)
        T[...] = jnp.ones_like(T)
        istop[...] = jnp.full_like(istop, BIG_I32)
        dacc[...] = jnp.zeros_like(dacc)
        med[...] = jnp.zeros_like(med)
        found[...] = jnp.zeros_like(found)
        dist[...] = jnp.zeros_like(dist)
        A1[...] = jnp.zeros_like(A1)
        M1[...] = jnp.zeros_like(M1)
        M2[...] = jnp.zeros_like(M2)
        alldone[0] = 0

    @pl.when(valid & (alldone[0] == 0))
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        base0 = blk_ref[k] * sb
        tri = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
               < lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1))
        trif = tri.astype(jnp.float32)
        lane = lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
        for j in range(sb // chunk):
            @pl.when((j * chunk < hi) & ((j + 1) * chunk > lo))
            def _(j=j):
                sl = slice(j * chunk, (j + 1) * chunk)
                t = _surfel_terms(surf_ref[:, sl], px, py)
                idx = base0 + j * chunk + lane
                lane_sb = j * chunk + lane
                in_rng = ((lane_sb >= lo) & (lane_sb < hi)
                          & (idx < istop[...]))
                a = jnp.where(t["keep"] & in_rng, t["alpha"], 0.0)

                lf = jnp.log1p(-a)
                S_exc = jnp.dot(lf, trif,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
                T_exc = T[...] * jnp.exp(S_exc)
                T_inc = T_exc * (1.0 - a)

                comp = (T_inc > MIN_TRANSMITTANCE) & (a > 0.0)
                w = jnp.where(comp, a * T_exc, 0.0)
                ch = surf_ref[N_GEOM_S:N_GEOM_S + C, sl]
                acc[...] += jnp.dot(w, ch.T,
                                    preferred_element_type=jnp.float32,
                                    precision=lax.Precision.HIGHEST)
                depth = t["depth"]
                dacc[...] += jnp.sum(w * depth, axis=1, keepdims=True)

                # median: the first composite crossing T_inc <= 0.5
                crossed = comp & (T_exc > 0.5) & (T_inc <= 0.5)
                med[...] += jnp.where(
                    found[...] > 0.0, 0.0,
                    jnp.sum(jnp.where(crossed, depth, 0.0), axis=1,
                            keepdims=True))
                found[...] = jnp.maximum(
                    found[...],
                    jnp.max(crossed.astype(jnp.float32), axis=1,
                            keepdims=True))

                # distortion with running exclusive prefixes
                m = _map_depth(depth)
                wm = w * m
                wm2 = wm * m
                A_exc = A1[...] + jnp.dot(
                    w, trif, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                M1_exc = M1[...] + jnp.dot(
                    wm, trif, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                M2_exc = M2[...] + jnp.dot(
                    wm2, trif, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                dist[...] += jnp.sum(
                    w * (m * m * A_exc + M2_exc - 2.0 * m * M1_exc),
                    axis=1, keepdims=True)
                A1[...] += jnp.sum(w, axis=1, keepdims=True)
                M1[...] += jnp.sum(wm, axis=1, keepdims=True)
                M2[...] += jnp.sum(wm2, axis=1, keepdims=True)

                lf_eff = jnp.where(comp, lf, 0.0)
                T[...] = T[...] * jnp.exp(
                    jnp.sum(lf_eff, axis=1, keepdims=True))
                brk = (T_inc <= MIN_TRANSMITTANCE) & (a > 0.0)
                first_brk = jnp.min(jnp.where(brk, idx, BIG_I32), axis=1,
                                    keepdims=True)
                istop[...] = jnp.minimum(istop[...], first_brk)
        alldone[0] = jnp.all(istop[...] < BIG_I32).astype(jnp.int32)

    @pl.when(last)
    def _():
        out_ref[0] = acc[...]
        aux_ref[0, 0] = T[...][:, 0]
        aux_ref[0, 1] = dacc[...][:, 0]
        aux_ref[0, 2] = med[...][:, 0]
        aux_ref[0, 3] = dist[...][:, 0]
        aux_ref[0, 4] = A1[...][:, 0]
        aux_ref[0, 5] = M1[...][:, 0]
        aux_ref[0, 6] = M2[...][:, 0]
        aux_ref[0, 7] = found[...][:, 0]
        istop_ref[0, 0] = istop[...][:, 0]


def _rasterize_fwd_raw_s(surf_s, sched: ChunkSchedule, n_tiles, tiles_x,
                         tile_size, sb, chunk, n_channels, interpret):
    G = sched.blk.shape[0]
    P = tile_size * tile_size
    R = surf_s.shape[0]
    C = n_channels

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, sb), lambda k, b, t, f: (0, b[k])),
        ],
        out_specs=[
            pl.BlockSpec((1, P, C), lambda k, b, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 8, P), lambda k, b, t, f: (t[k], 0, 0)),
            pl.BlockSpec((1, 1, P), lambda k, b, t, f: (t[k], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, C), jnp.float32),   # acc
            pltpu.VMEM((P, 1), jnp.float32),   # T
            pltpu.VMEM((P, 1), jnp.int32),     # istop
            pltpu.VMEM((P, 1), jnp.float32),   # depth acc
            pltpu.VMEM((P, 1), jnp.float32),   # median
            pltpu.VMEM((P, 1), jnp.float32),   # found
            pltpu.VMEM((P, 1), jnp.float32),   # distortion
            pltpu.VMEM((P, 1), jnp.float32),   # A1
            pltpu.VMEM((P, 1), jnp.float32),   # M1
            pltpu.VMEM((P, 1), jnp.float32),   # M2
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out, aux, istop = pl.pallas_call(
        functools.partial(_fwd_kernel_s, tiles_x=tiles_x,
                          tile_size=tile_size, sb=sb, chunk=chunk,
                          n_channels=C, n_rows=R),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, P, C), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32),
        ],
        interpret=interpret,
    )(sched.blk, sched.tile_of_chunk, sched.flags, surf_s)
    return out, aux, istop


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _cross_rows(a, b):
    """cross product of two row-triples ([P, K] x3 each)."""
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _bwd_kernel_s(
    blk_ref, tile_ref, flags_ref, rvflag_ref,
    surf_ref, gout_ref, gaux_ref, aux_ref, istop_ref,
    dsurf_ref,
    T_run, Sg, Wa, M1a, M2a, max_istop,
    *, tiles_x: int, tile_size: int, sb: int, chunk: int, n_channels: int,
):
    k = pl.program_id(0)
    pos = pl.num_programs(0) - 1 - k
    tile = tile_ref[pos]
    valid, first, last, lo, hi = _unpack(flags_ref[pos])
    fresh = rvflag_ref[pos] == 0
    P = tile_size * tile_size
    C = n_channels

    @pl.when(last)
    def _():
        tf = aux_ref[0, 0][:, None]
        galpha = gaux_ref[0, 0][:, None]
        Sg[...] = -tf * galpha
        T_run[...] = tf
        Wa[...] = jnp.zeros_like(Wa)
        M1a[...] = jnp.zeros_like(M1a)
        M2a[...] = jnp.zeros_like(M2a)
        max_istop[0] = jnp.max(
            jnp.minimum(istop_ref[0, 0], BIG_I32 - 1)) + 1

    base0 = blk_ref[pos] * sb
    active = valid & (base0 < max_istop[0])

    dprev = dsurf_ref[...]

    @pl.when(active)
    def _():
        px, py = _pixel_coords(tile, tiles_x, tile_size)
        g = gout_ref[0]                                # [P, C]
        gd = gaux_ref[0, 1][:, None]                   # [P, 1]
        gD = gaux_ref[0, 2][:, None]
        Afin = aux_ref[0, 4][:, None]
        M1fin = aux_ref[0, 5][:, None]
        M2fin = aux_ref[0, 6][:, None]
        lane = lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
        lane1 = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        tri_ge = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
                  >= lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
                  ).astype(jnp.float32)
        tri_gt = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
                  > lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
                  ).astype(jnp.float32)
        istop_col = istop_ref[0, 0][:, None]

        def mm(x, tr):
            return jnp.dot(x, tr, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)

        for j in reversed(range(sb // chunk)):
            sl = slice(j * chunk, (j + 1) * chunk)
            touches = (j * chunk < hi) & ((j + 1) * chunk > lo)

            @pl.when(touches)
            def _(j=j, sl=sl):
                t = _surfel_terms(surf_ref[:, sl], px, py)
                lane_sb = j * chunk + lane
                idx = base0 + lane_sb
                in_rng = (lane_sb >= lo) & (lane_sb < hi)
                comp = t["keep"] & in_rng & (idx < istop_col)
                a = jnp.where(comp, t["alpha"], 0.0)
                lf = jnp.log1p(-a)

                S_inc = mm(lf, tri_ge)
                T_exc = T_run[...] * jnp.exp(-S_inc)
                w = a * T_exc
                depth = t["depth"]
                m = _map_depth(depth)
                wm = w * m
                wm2 = wm * m

                ch = surf_ref[N_GEOM_S:N_GEOM_S + C, sl]
                cg = jnp.dot(g, ch, preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)

                Wa_i = Wa[...] + mm(w, tri_gt)
                M1a_i = M1a[...] + mm(wm, tri_gt)
                M2a_i = M2a[...] + mm(wm2, tri_gt)
                A_exc = Afin - Wa_i - w
                M1_exc = M1fin - M1a_i - wm
                M2_exc = M2fin - M2a_i - wm2

                dw = (cg + gd * depth
                      + gD * (m * m * (A_exc + Wa_i)
                              + (M2_exc + M2a_i)
                              - 2.0 * m * (M1_exc + M1a_i)))
                q = w * dw
                Sq = Sg[...] + mm(q, tri_gt)
                one_minus = jnp.maximum(1.0 - a, 1e-3)
                dalpha = jnp.where(comp, T_exc * dw - Sq / one_minus, 0.0)
                ddepth = jnp.where(
                    comp,
                    w * (gd + 2.0 * gD
                         * (m * (A_exc + Wa_i) - (M1_exc + M1a_i))
                         * _dmap_ddepth(depth)), 0.0)

                nc = t["raw"] < MAX_ALPHA_2D
                dG = jnp.where(nc, dalpha * t["op"], 0.0)
                dop = jnp.where(nc & comp, dalpha * t["G"], 0.0)
                drho = -0.5 * t["G"] * dG
                drho3 = jnp.where(t["use3d"], drho, 0.0)
                drho2 = jnp.where(t["use3d"], 0.0, drho)

                u, v, zc = t["u"], t["v"], t["zc"]
                # depth depends on (u, v, zc0, zc1) only in the use3d
                # branch (center-depth fallback otherwise — see
                # _surfel_terms); zc2's gradient is 1 in both branches
                dd3 = jnp.where(t["use3d"], ddepth, 0.0)
                du = 2.0 * u * drho3 + dd3 * zc[0]
                dv = 2.0 * v * drho3 + dd3 * zc[1]
                dzu = jnp.sum(dd3 * u, axis=0, keepdims=True)
                dzv = jnp.sum(dd3 * v, axis=0, keepdims=True)
                dz0 = jnp.sum(ddepth, axis=0, keepdims=True)

                cz = t["cz"]
                ds = [du / cz, dv / cz, -(du * u + dv * v) / cz]
                dhx = _cross_rows(t["hy"], ds)
                dhy = _cross_rows(ds, t["hx"])

                # rho2d branch -> Tw via the projected center
                ddxp = FILTER_INV_SQUARE * 2.0 * t["dxp"] * drho2
                ddyp = FILTER_INV_SQUARE * 2.0 * t["dyp"] * drho2
                dcxp = -jnp.sum(ddxp, axis=0, keepdims=True)
                dcyp = -jnp.sum(ddyp, axis=0, keepdims=True)
                twz_s = t["twz_s"]
                Tw = t["Tw"]

                rows = []
                for i in range(3):                     # Tu, Tv, Tw rows
                    d0 = -jnp.sum(dhx[i], axis=0, keepdims=True)
                    d1 = -jnp.sum(dhy[i], axis=0, keepdims=True)
                    d2 = jnp.sum(px * dhx[i] + py * dhy[i], axis=0,
                                 keepdims=True)
                    if i == 2:
                        d0 = d0 + dcxp / twz_s
                        d1 = d1 + dcyp / twz_s
                        d2 = d2 - (dcxp * Tw[0] + dcyp * Tw[1]) \
                            / (twz_s * twz_s)
                    rows += [d0, d1, d2]
                rows += [dzu, dzv, dz0,
                         jnp.sum(dop, axis=0, keepdims=True)]
                dch = lax.dot_general(
                    g, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)   # [C, K]
                dnew = jnp.concatenate(
                    rows + [dch,
                            jnp.zeros((dsurf_ref.shape[0] - N_GEOM_S - C,
                                       chunk), jnp.float32)], axis=0)

                lane1_sb = j * chunk + lane1
                in1 = (lane1_sb >= lo) & (lane1_sb < hi)
                dsurf_ref[:, sl] = jnp.where(
                    in1, dnew, jnp.where(fresh, 0.0, dprev[:, sl]))

                T_run[...] = T_run[...] * jnp.exp(
                    -jnp.sum(lf, axis=1, keepdims=True))
                Sg[...] = Sg[...] + jnp.sum(q, axis=1, keepdims=True)
                Wa[...] = Wa[...] + jnp.sum(w, axis=1, keepdims=True)
                M1a[...] = M1a[...] + jnp.sum(wm, axis=1, keepdims=True)
                M2a[...] = M2a[...] + jnp.sum(wm2, axis=1, keepdims=True)

            @pl.when(jnp.logical_not(touches) & fresh)
            def _(sl=sl):
                dsurf_ref[:, sl] = jnp.zeros(
                    (dsurf_ref.shape[0], chunk), jnp.float32)

    @pl.when(jnp.logical_not(active) & fresh)
    def _():
        dsurf_ref[...] = jnp.zeros_like(dprev)


def _rasterize_bwd_raw_s(surf_s, gout, gaux, aux, istop,
                         sched: ChunkSchedule, n_tiles, tiles_x, tile_size,
                         sb, chunk, n_channels, interpret):
    G = sched.blk.shape[0]
    P = tile_size * tile_size
    R = surf_s.shape[0]
    capacity = surf_s.shape[1]
    C = n_channels

    rv = jnp.concatenate([
        (sched.blk[:-1] == sched.blk[1:]).astype(jnp.int32),
        jnp.zeros((1,), jnp.int32)], axis=0)

    def rev(idx_fn):
        return lambda k, b, t, f, r: idx_fn(G - 1 - k, b, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, sb), rev(lambda p, b, t: (0, b[p]))),
            pl.BlockSpec((1, P, C), rev(lambda p, b, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 4, P), rev(lambda p, b, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 8, P), rev(lambda p, b, t: (t[p], 0, 0))),
            pl.BlockSpec((1, 1, P), rev(lambda p, b, t: (t[p], 0, 0))),
        ],
        out_specs=[
            pl.BlockSpec((R, sb), rev(lambda p, b, t: (0, b[p]))),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),   # T_run
            pltpu.VMEM((P, 1), jnp.float32),   # Sg
            pltpu.VMEM((P, 1), jnp.float32),   # W after
            pltpu.VMEM((P, 1), jnp.float32),   # M1 after
            pltpu.VMEM((P, 1), jnp.float32),   # M2 after
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (dsurf,) = pl.pallas_call(
        functools.partial(_bwd_kernel_s, tiles_x=tiles_x,
                          tile_size=tile_size, sb=sb, chunk=chunk,
                          n_channels=C),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, capacity), jnp.float32),
        ],
        interpret=interpret,
    )(sched.blk, sched.tile_of_chunk, sched.flags, rv, surf_s, gout, gaux,
      aux, istop)
    return dsurf


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def rasterize_surfels_pallas(Tu, Tv, Tw, zcoef, opacities, channels,
                             isects: PaddedIsects, img_height, img_width,
                             tile_size=16, chunk=128, interpret=False,
                             capacity=None):
    """Pallas surfel rasterization.

    Returns (channels_img [H, W, C] WITHOUT background, alpha [H, W],
    exp_depth [H, W] (unnormalized sum w*depth), median_depth [H, W]
    (forward-only: no gradient, like the CUDA kernel's TSDF use),
    distortion [H, W]).
    """
    out, _ = _fwd_impl_s(Tu, Tv, Tw, zcoef, opacities, channels, isects,
                         img_height, img_width, tile_size, chunk,
                         interpret, capacity)
    return out


def _fwd_impl_s(Tu, Tv, Tw, zcoef, opacities, channels, isects,
                img_height, img_width, tile_size, chunk, interpret,
                capacity):
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    n, C = channels.shape
    if capacity is None:
        capacity = 4 * n
    capacity = -(-capacity // STREAM_BLOCK) * STREAM_BLOCK
    tile_bits = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    depth_bits = 32 - tile_bits

    with jax.named_scope("surfel_expand_sort"):
        sorted_keys, gid_sorted, surf_s = _expand_sorted_s(
            Tu, Tv, Tw, zcoef, opacities, channels, isects, capacity,
            tiles_x, tiles_y, depth_bits, interpret)
    with jax.named_scope("surfel_schedule"):
        sched = _build_schedule(sorted_keys, n_tiles, depth_bits, capacity,
                                STREAM_BLOCK)
    with jax.named_scope("surfel_raster_fwd"):
        out_t, aux_t, istop_t = _rasterize_fwd_raw_s(
            surf_s, sched, n_tiles, tiles_x, tile_size, STREAM_BLOCK,
            chunk, C, interpret)

    empty = (sched.tile_counts == 0)
    out_t = jnp.where(empty[:, None, None], 0.0, out_t)
    # aux rows: tfin, dacc, med, dist, A1, M1, M2, found
    empty_aux = jnp.stack(
        [jnp.ones((n_tiles,), jnp.float32)]
        + [jnp.zeros((n_tiles,), jnp.float32)] * 7, axis=1)[:, :, None]
    aux_t = jnp.where(empty[:, None, None], empty_aux, aux_t)
    istop_t = jnp.where(empty[:, None, None], BIG_I32, istop_t)

    ts = tile_size
    out = _tiles_to_image(out_t, tiles_y, tiles_x, ts, img_height,
                          img_width)
    def img_of(row):
        return _tiles_to_image(aux_t[:, row, :, None], tiles_y, tiles_x,
                               ts, img_height, img_width)[..., 0]
    alpha = 1.0 - img_of(0)
    exp_depth = img_of(1)
    median = img_of(2)
    distortion = img_of(3)

    n_real = jnp.searchsorted(
        sorted_keys, jnp.uint32(n_tiles) << depth_bits).astype(jnp.int32)
    res = (surf_s, gid_sorted, sched, aux_t, istop_t, n_real, n, C)
    return (out, alpha, exp_depth, median, distortion), res


def _surfel_fwd(Tu, Tv, Tw, zcoef, opacities, channels, isects,
                img_height, img_width, tile_size, chunk, interpret,
                capacity):
    out, res = _fwd_impl_s(Tu, Tv, Tw, zcoef, opacities, channels, isects,
                           img_height, img_width, tile_size, chunk,
                           interpret, capacity)
    return out, res + (isects,)


def _surfel_bwd(img_height, img_width, tile_size, chunk, interpret,
                capacity, res, cotangents):
    (surf_s, gid_sorted, sched, aux_t, istop_t, n_real, n, C, isects) = res
    g_out, g_alpha, g_depth, g_med, g_dist = cotangents
    del g_med                       # median depth is forward-only
    tiles_x = -(-img_width // tile_size)
    tiles_y = -(-img_height // tile_size)
    n_tiles = tiles_x * tiles_y
    ts = tile_size

    gout_t = _image_to_tiles(g_out, tiles_y, tiles_x, ts)
    gaux_t = jnp.stack([
        _image_to_tiles(g_alpha, tiles_y, tiles_x, ts)[..., 0],
        _image_to_tiles(g_depth, tiles_y, tiles_x, ts)[..., 0],
        _image_to_tiles(g_dist, tiles_y, tiles_x, ts)[..., 0],
        jnp.zeros((n_tiles, ts * ts), jnp.float32),
    ], axis=1)                                         # [T, 4, P]
    # alpha = 1 - tfin: the kernel's galpha convention matches d(1-T) = -dT
    with jax.named_scope("surfel_raster_bwd"):
        dsurf_s = _rasterize_bwd_raw_s(
            surf_s, gout_t, gaux_t, aux_t, istop_t, sched, n_tiles,
            tiles_x, ts, STREAM_BLOCK, chunk, C, interpret)

    capacity_r = surf_s.shape[1]
    pos = jnp.arange(capacity_r, dtype=jnp.int32)
    live = (pos < n_real)[None, :]
    dsurf_s = jnp.where(live, dsurf_s, 0.0)

    # reduce 13 + C gradient rows by gid: a payload-carrying sort groups
    # each gaussian's slots contiguously; the windowed reduce kernel runs
    # per 16-row group. (A scatter-based inverse-permutation variant was
    # measured slower in round 3 — GSL_SCATTER_REDUCE, NOTES_ROUND3.md —
    # and removed in round 4.)
    R = N_GEOM_S + C
    with jax.named_scope("surfel_grad_reduce"):
        ops = lax.sort(
            (gid_sorted,) + tuple(dsurf_s[i] for i in range(R)),
            num_keys=1, is_stable=True)
        gid2 = ops[0]
        srows = list(ops[1:])
        outs = []
        for g0 in range(0, R, TABLE_D):
            grp = srows[g0:g0 + TABLE_D]
            grp += [jnp.zeros((capacity_r,), jnp.float32)] \
                * (TABLE_D - len(grp))
            outs.append(_reduce_sorted_rows(
                jnp.stack(grp, axis=0), gid2, n, interpret))
        summed = jnp.concatenate(outs, axis=1)[:, :R]  # [N, R]

    summed = jnp.where((isects.offsets < capacity_r)[:, None], summed, 0.0)
    dTu = summed[:, 0:3]
    dTv = summed[:, 3:6]
    dTw = summed[:, 6:9]
    dzc = summed[:, 9:12]
    dop = summed[:, 12]
    dch = summed[:, 13:]

    def zero_like(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros(jnp.shape(x), x.dtype)
        return np.zeros(np.shape(x), jax.dtypes.float0)

    d_isects = jax.tree.map(zero_like, isects)
    return dTu, dTv, dTw, dzc, dop, dch, d_isects


rasterize_surfels_pallas.defvjp(_surfel_fwd, _surfel_bwd)

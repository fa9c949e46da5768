"""Per-stage timing of the rasterization pipeline on the current backend.

Prints a table of ms/stage for the synthetic 1M-gaussian 1080p benchmark
scene (the same scene bench.py uses), covering: projection, SH colors,
intersection encode, expand+sort, schedule build, forward kernel, backward
kernel, gid-sort+reduce, and the full e2e fwd+bwd step.

Timing methodology (IMPORTANT on this environment): plain
block_until_ready loops through the remote TPU tunnel under-report —
each stage iteration here is CHAINED on the previous one's output via a
zero-valued scalar bias, so the k executions serialize on-device and one
final fetch bounds the true wall-clock (NOTES_ROUND3.md methodology).

Reference role: the stage structure mirrors the CUDA pipeline being
matched (/root/reference/internal/renderers/gsplat_v1_renderer.py:387-640
via gsplat's fully_fused_projection / isect_tiles / rasterize_to_pixels).

Usage:
  GSL_PLATFORM=cpu python tools/profile_stages.py --n 100000 --height 256
  python tools/profile_stages.py                  # TPU, full bench scene
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import gsl_tpu  # noqa: F401  (GSL_PLATFORM handling)
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--tile-size", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--isect-cap", type=int, default=0,
                    help="0 = probe and size 1.08x over the padded count")
    args = ap.parse_args()

    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.ops import rasterize_pallas as rp
    from gsl_tpu.ops.projection import project_gaussians, tile_rect
    from gsl_tpu.ops.sh import sh_to_rgb

    H, W, n, ts = args.height, args.width, args.n, args.tile_size
    cap = 1
    while cap < n:
        cap <<= 1
    state = _synthetic_state(n, cap, sh_degree=3, seed=0)
    params = state.params
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fx=1600.0, fy=1600.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    tiles_x, tiles_y = -(-W // ts), -(-H // ts)
    interp = jax.default_backend() != "tpu"

    results = []

    def timeit(name, f, *a):
        """f(*a, bias) -> pytree. Chained-bias timing INSIDE one jit: a
        lax.scan runs all iterations on-device, each chained on a tiny
        scalar derived from ALL output leaves, so the k executions
        serialize with NO per-iteration host dispatch. (A host-side
        dispatch loop pays a tunnel round-trip per iteration on this
        environment — measured ~15x inflation at 1M-gaussian scale.)

        The chain scalar must be (a) not constant-foldable — `leaf * 0`
        folds for INT leaves, letting XLA hoist the whole stage out of the
        loop — and (b) derived from every output, or XLA dead-code-
        eliminates the unused ones (e.g. drops operands from a sort). A
        full sum of each leaf scaled by 1e-38 satisfies both; the bias it
        feeds back into f's float inputs rounds away to a no-op."""
        def body(bias, _):
            out = f(*a, bias)
            tot = sum(jnp.sum(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out))
            return tot * jnp.float32(1e-38), None

        jf = jax.jit(lambda: jax.lax.scan(
            body, jnp.zeros(()), None, length=args.iters)[0])
        jax.block_until_ready(jf())  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(jf())
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results.append((name, ms))
        print("%-22s %8.2f ms" % (name, ms), flush=True)
        return jax.block_until_ready(jax.jit(f)(*a, jnp.zeros(())))

    # dispatch/fetch floor: one chained scan of no-op iterations. Every
    # stage row below carries this same fixed cost / iters; subtract it.
    timeit("(null floor)", lambda b: b + 1.0)

    proj = timeit("project", lambda b: project_gaussians(
        params.means + b, jnp.exp(params.scales), params.rotations,
        cam.world_to_camera, cam.fx, cam.fy, cam.cx, cam.cy, W, H))

    opac = jax.nn.sigmoid(params.opacities[:, 0])
    campos = np.zeros(3, np.float32)
    dirs = params.means - campos
    colors = timeit("sh_colors", lambda b: sh_to_rgb(
        jnp.concatenate([params.shs_dc, params.shs_rest], 1) + b, dirs, 3))

    if args.isect_cap:
        cap_i = args.isect_cap
    else:
        rmin, rmax = tile_rect(proj, ts, tiles_x, tiles_y)
        counts = (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
        padded = int(jnp.sum(jnp.maximum(counts, 1)))
        cap_i = -(-int(padded * 1.08) // 1024) * 1024
    print(f"# isect capacity {cap_i}")

    isects = timeit("isect_encode", lambda b: rp.isect_encode_padded(
        proj._replace(means2d=proj.means2d + b), H, W, ts,
        capacity=cap_i))
    print("  n_isects=%d padded=%d dropped=%d"
          % (isects.n_isects, isects.total_padded, isects.n_dropped))

    depth_bits = 32 - max(int(np.ceil(np.log2(tiles_x * tiles_y + 1))), 1)
    sk, gid_s, geom_s, color_s, _ = timeit(
        "expand+sort", lambda b: rp._expand_sorted(
            proj.means2d + b, proj.conics, opac, colors, isects, cap_i,
            ts, tiles_x, tiles_y, depth_bits, True, interp, True))

    sched = timeit("schedule", lambda b: rp._build_schedule(
        sk + b.astype(sk.dtype), tiles_x * tiles_y, depth_bits, cap_i,
        rp.STREAM_BLOCK))

    out_t, tfin_t, istop_t = timeit(
        "raster_fwd", lambda b: rp._rasterize_fwd_raw(
            geom_s + b.astype(geom_s.dtype), color_s, sched,
            tiles_x * tiles_y, tiles_x, ts, rp.STREAM_BLOCK, args.chunk,
            interp, True))

    gout = jnp.ones((tiles_x * tiles_y, ts * ts, 3), jnp.float32)
    galpha = jnp.ones((tiles_x * tiles_y, 1, ts * ts), jnp.float32)
    dgeom_s, dcolor_s = timeit(
        "raster_bwd", lambda b: rp._rasterize_bwd_raw(
            geom_s + b.astype(geom_s.dtype), color_s, gout, galpha,
            tfin_t, istop_t, sched, tiles_x * tiles_y, tiles_x, ts,
            rp.STREAM_BLOCK, args.chunk, interp, None, True))

    timeit("reduce_by_gid", lambda b: rp._reduce_by_gid(
        dgeom_s + b.astype(dgeom_s.dtype), dcolor_s, gid_s, cap,
        interp, True))

    tap = jnp.zeros((cap, 2), jnp.float32)

    def loss(m, c, o, ch):
        img, alpha = rp.rasterize_pallas(m, c, o, ch, tap, isects, H, W,
                                         ts, args.chunk, interp, cap_i,
                                         True, True)
        return jnp.sum(img) + jnp.sum(alpha)

    timeit("e2e raster fwd+bwd", lambda b: jax.grad(
        loss, argnums=(0, 1, 2, 3))(proj.means2d + b, proj.conics, opac,
                                    colors))

    floor = results[0][1]
    total = sum(ms - floor for _, ms in results[1:-1])
    e2e = results[-1][1] - floor
    px = H * W
    print("-" * 34)
    print("%-22s %8.2f ms" % ("sum of stages (-floor)", total))
    print("e2e fwd+bwd: %.1f ms  ->  %.2fM pixels/s"
          % (e2e, px / e2e / 1e3))


if __name__ == "__main__":
    main()

"""Per-stage time split of the sharded MP training step vs device count
(VERDICT r4 'next' #6).

On the single-host virtual CPU mesh, bytes-on-wire are nearly free, so the
end-to-end table in MULTICHIP_SCALING.md cannot show what the exchange
costs — this tool measures the thing the CPU mesh CAN prove: where the
step time goes as the mesh grows, stage by stage, for the full-capacity
and the compacted top-K exchange. Mirrors
gsl_tpu/parallel/gaussian_sharded.py:make_mp_train_step (reference role:
gsplat_distributed_renderer.py:127-217,423-510) with cumulative early-exit
cuts; stage cost = difference of successive cuts:

  proj      per-shard projection + SH color (vmap over the mp cameras)
  compact   top-K visible-first argsort + gather (skipped in full mode)
  exchange  the two lax.all_to_all('mp') payload/radii exchanges
  fwd       tile binning + rasterization + loss (forward)
  bwd       jax.value_and_grad of all of the above (incl. the all_to_all
            transpose), before any cross-device grad reduction
  reduce+up lax.psum(grads, 'dp') + pmean(loss) + Adam update

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GSL_PLATFORM=cpu \
      python tools/mp_stage_split.py --n 20000 --height 128
Writes a markdown table to stdout (paste into MULTICHIP_SCALING.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import gsl_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P


def build_cuts(mesh, H, W, sh_degree, isect_capacity, max_per_tile, chunk,
               compact_k):
    """Return {name: jitted fn(params, alive, cams, gts, bg) -> scalar}
    with each fn ending at the named cumulative cut."""
    from gsl_tpu.models.gaussian import OptimizationConfig
    from gsl_tpu.ops.projection import Projections
    from gsl_tpu.ops.tiling import isect_encode
    from gsl_tpu.ops.rasterize_jax import rasterize_tiles
    from gsl_tpu.parallel.gaussian_sharded import _project_and_color
    from gsl_tpu.training.metrics import train_loss
    from gsl_tpu.training.optimizers import build_gaussian_optimizer

    n_mp = mesh.shape["mp"]
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)

    def fwd_to(cut, params, alive, cams, gts, bg):
        my_gt = gts[0]
        cams_mp = jax.tree.map(
            lambda x: lax.all_gather(x, "mp", axis=0, tiled=True), cams)
        cap_local = params.means.shape[0]

        def proj_one(cam_i):
            return _project_and_color(params, alive, cam_i, H, W,
                                      sh_degree, True, 0.3)

        payload, radii = jax.vmap(proj_one)(cams_mp)
        if cut == "proj":
            return jnp.sum(payload) + jnp.sum(radii.astype(jnp.float32))
        k_eff = cap_local if compact_k is None else min(compact_k,
                                                        cap_local)
        radii_for_x = radii
        if k_eff < cap_local:
            order = lax.stop_gradient(
                jnp.argsort(radii <= 0, axis=1, stable=True))[:, :k_eff]
            payload = jnp.take_along_axis(payload, order[..., None],
                                          axis=1)
            radii_for_x = jnp.take_along_axis(radii, order, axis=1)
        if cut == "compact":
            return jnp.sum(payload) + jnp.sum(
                radii_for_x.astype(jnp.float32))
        payload = lax.all_to_all(payload, "mp", split_axis=0,
                                 concat_axis=0, tiled=False)
        radii_x = lax.all_to_all(radii_for_x, "mp", split_axis=0,
                                 concat_axis=0, tiled=False)
        if cut == "exchange":
            return jnp.sum(payload) + jnp.sum(radii_x.astype(jnp.float32))
        n_total = n_mp * k_eff
        payload = payload.reshape(n_total, payload.shape[-1])
        radii_full = radii_x.reshape(n_total)
        proj = Projections(
            means2d=payload[:, 0:2], depths=payload[:, 9],
            radii=radii_full, conics=payload[:, 2:5],
            compensations=jnp.ones((n_total,), payload.dtype),
            mask=radii_full > 0)
        isects = isect_encode(proj, H, W, 16, isect_capacity)
        img, _ = rasterize_tiles(
            proj.means2d, proj.conics, payload[:, 5], payload[:, 6:9],
            isects, H, W, tile_size=16, max_per_tile=max_per_tile,
            chunk=chunk, background=bg)
        loss, _ = train_loss(img, my_gt)
        return loss

    def make(cut):
        if cut in ("proj", "compact", "exchange", "fwd"):
            def body(params, alive, cams, gts, bg):
                c = "fwd" if cut == "fwd" else cut
                if c == "fwd":
                    return fwd_to("loss", params, alive, cams, gts, bg)
                return fwd_to(c, params, alive, cams, gts, bg)
        elif cut == "bwd":
            def body(params, alive, cams, gts, bg):
                loss, g = jax.value_and_grad(
                    lambda p: fwd_to("loss", p, alive, cams, gts, bg)
                )(params)
                return loss + sum(jnp.sum(x) for x in jax.tree.leaves(g))
        else:  # full
            def body(params, alive, cams, gts, bg):
                loss, g = jax.value_and_grad(
                    lambda p: fwd_to("loss", p, alive, cams, gts, bg)
                )(params)
                loss = lax.pmean(loss, ("dp", "mp"))
                g = lax.psum(g, "dp")
                return loss, g

        pspec = P("mp")
        cam_spec = P(("dp", "mp"))
        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(pspec, pspec, cam_spec, cam_spec, P()),
            out_specs=(P(), pspec) if cut == "full" else P(),
            check_vma=False)
        if cut != "full":
            return jax.jit(sm)
        opt_state0 = {}

        def full(params, alive, cams, gts, bg, opt_state):
            loss, g = sm(params, alive, cams, gts, bg)
            updates, opt_state = tx.update(g, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return loss, params, opt_state

        return jax.jit(full), tx

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()
    H, W = args.height, args.width

    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.parallel.gaussian_sharded import make_mesh

    cuts = ["proj", "compact", "exchange", "fwd", "bwd", "full"]
    print(f"# stage split: {args.n} gaussians {H}x{W} "
          f"{args.iters} iters/cut (cumulative ms)")
    header = ("| devices | mesh | mode | " + " | ".join(cuts)
              + " | stage breakdown (ms) |")
    print(header)
    print("|" + "---|" * (len(cuts) + 4))
    for nd in args.devices:
        if nd > len(jax.devices()):
            continue
        mp = 4 if nd % 4 == 0 else (2 if nd % 2 == 0 else 1)
        mesh = make_mesh(nd, dp=nd // mp, mp=mp)
        cap = 1
        while cap < args.n:
            cap <<= 1
        cap = max(cap, 256 * mp)
        state = _synthetic_state(args.n, cap, sh_degree=3, seed=0)
        cams = [make_camera(
            R=np.eye(3), T=np.array([0.8 * i - 0.4 * nd, 0.0, 0.0]),
            fx=H * 4.0, fy=H * 4.0, cx=W / 2, cy=H / 2,
            width=W, height=H) for i in range(nd)]
        cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        gts = jnp.full((nd, H, W, 3), 0.5, jnp.float32)
        bg = jnp.zeros(3, jnp.float32)

        from gsl_tpu.parallel.gaussian_sharded import shard_params
        from gsl_tpu.models.gaussian import OptimizationConfig
        from gsl_tpu.training.optimizers import build_gaussian_optimizer
        tx0 = build_gaussian_optimizer(OptimizationConfig(), 1.0)
        opt0 = tx0.init(state.params)
        params_s, alive_s, opt_s = shard_params(mesh, state.params,
                                                state.alive, opt0)

        for mode, ck in (("full", None), ("topK", 2048)):
            make = build_cuts(mesh, H, W, 3, 1 << 16, 512, 64, ck)
            times = {}
            for cut in cuts:
                if cut == "compact" and ck is None:
                    times[cut] = times["proj"]
                    continue
                built = make(cut)
                if cut == "full":
                    fn, tx = built
                    out = fn(params_s, alive_s, cam_batch, gts, bg, opt_s)
                    jax.block_until_ready(out[0])
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = fn(params_s, alive_s, cam_batch, gts, bg,
                                 out[2])
                    jax.block_until_ready(out[0])
                else:
                    fn = built
                    out = fn(params_s, alive_s, cam_batch, gts, bg)
                    jax.block_until_ready(out)
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = fn(params_s, alive_s, cam_batch, gts, bg)
                    jax.block_until_ready(out)
                times[cut] = (time.perf_counter() - t0) / args.iters * 1e3
            stages = []
            prev = 0.0
            for cut in cuts:
                stages.append(f"{cut}:{times[cut] - prev:+.1f}")
                prev = times[cut]
            print(f"| {nd} | {dict(mesh.shape)} | {mode} | "
                  + " | ".join(f"{times[c]:.1f}" for c in cuts)
                  + " | " + " ".join(stages) + " |", flush=True)


if __name__ == "__main__":
    main()

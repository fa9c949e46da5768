"""Step-time vs device-count table for the sharded MP training step.

Runs the gaussian-sharded training step (camera DP x gaussian MP,
gsl_tpu/parallel/gaussian_sharded.py) on a virtual CPU mesh at 1/2/4/8
devices and records per-step wall-clock. On a single-host CPU mesh the
numbers measure the OVERHEAD SHAPE of the all_to_all projection exchange
and psum'd gradients (collectives are real XLA collectives, just over
shared memory), not chip throughput — the point is a recorded baseline of
how exchange cost grows with mesh size before real multi-chip hardware is
available. Reference role: the MPStrategy scaling charts
(/root/reference/README.md:558-570).

Usage (the force-host flag must be set before jax init):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GSL_PLATFORM=cpu \
      python tools/mp_scaling_table.py --n 20000 --height 128
Writes/updates MULTICHIP_SCALING.md at the repo root with the table.
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


def time_step(n_devices: int, n: int, H: int, W: int, iters: int,
              backend: str, compact_k=None):
    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.gaussian import OptimizationConfig
    from gsl_tpu.parallel.gaussian_sharded import (make_mesh,
                                                   make_mp_train_step,
                                                   shard_params)
    from gsl_tpu.training.optimizers import build_gaussian_optimizer

    mp = 1
    for cand in (4, 2, 1):
        if n_devices % cand == 0 and cand <= n_devices:
            mp = cand
            break
    mesh = make_mesh(n_devices, dp=n_devices // mp, mp=mp)
    cap = 1
    while cap < n:
        cap <<= 1
    cap = max(cap, 256 * mp)
    state = _synthetic_state(n, cap, sh_degree=3, seed=0)
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0)
    opt_state = tx.init(state.params)
    # narrow FOV so each camera sees only a fraction of the scene: the
    # compaction comparison is meaningful only with partial visibility
    # (real capture rigs never see every gaussian from every view)
    cams = [make_camera(R=np.eye(3),
                        T=np.array([0.8 * i - 0.4 * n_devices, 0.0, 0.0]),
                        fx=H * 4.0, fy=H * 4.0, cx=W / 2, cy=H / 2,
                        width=W, height=H) for i in range(n_devices)]
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    gts = jnp.full((n_devices, H, W, 3), 0.5, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    if compact_k == "auto":
        # the auto policy of fit_distributed: 1.3x the max per-shard
        # visible count, 512-aligned
        from gsl_tpu.models.gaussian import GaussianState
        from gsl_tpu.ops.projection import project_gaussians
        gs = GaussianState(params=state.params, alive=state.alive)

        @jax.jit
        def counts():
            def one(cam):
                pr = project_gaussians(
                    gs.get_means(), gs.get_scales(), gs.get_rotations(),
                    cam.world_to_camera, cam.fx, cam.fy, cam.cx, cam.cy,
                    W, H)
                vis = (pr.radii > 0).astype(jnp.int32)
                return jnp.max(jnp.sum(vis.reshape(mp, -1), axis=1))
            return jnp.max(jax.vmap(one)(cam_batch))

        compact_k = min(max(512, -(-int(1.3 * int(counts())) // 512) * 512),
                        cap // mp)
    step = make_mp_train_step(mesh, tx, H, W, sh_degree=3,
                              isect_capacity=max(4 * cap, 1 << 14),
                              max_per_tile=256, chunk=64, backend=backend,
                              compact_k=compact_k)
    params_s, alive_s, opt_s = shard_params(mesh, state.params,
                                            state.alive, opt_state)
    out = step(params_s, alive_s, opt_s, cam_batch, gts, bg)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out[0], alive_s, out[1], cam_batch, gts, bg)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    from gsl_tpu.parallel.gaussian_sharded import exchange_bytes_per_step
    xbytes = exchange_bytes_per_step(
        n_devices, mp, compact_k if compact_k else cap // mp)
    return dt, mesh.shape, float(out[2]), xbytes, int(out[5]), compact_k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--devices", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--backend", default="xla",
                    help="xla (compiled on CPU) | pallas (interpret on "
                         "CPU, compiled on TPU)")
    ap.add_argument("--out", default="MULTICHIP_SCALING.md")
    args = ap.parse_args()

    avail = len(jax.devices())
    rows = []
    for nd in args.devices:
        if nd > avail:
            print(f"# skipping {nd} devices ({avail} available)")
            continue
        for ck in (None, "auto"):
            dt, shape, loss, xb, ovf, k = time_step(
                nd, args.n, args.height, args.width, args.iters,
                args.backend, compact_k=ck)
            # cameras/step scales with devices: px/s = nd * H * W / dt
            px_s = nd * args.height * args.width / dt
            rows.append((nd, dict(shape), dt * 1000, px_s,
                         "full" if ck is None else f"K={k}", xb, ovf))
            print(f"devices={nd} mesh={dict(shape)} "
                  f"compact={'full' if ck is None else k} "
                  f"step={dt * 1000:.1f} ms pixels/s={px_s:,.0f} "
                  f"xchg={xb / 1e6:.2f}MB ovf={ovf} loss={loss:.4f}")

    if not rows:
        return
    base = max(px / nd for nd, _, _, px, tag, _, _ in rows if nd == rows[0][0])
    lines = [
        "# MP scaling table (virtual CPU mesh)",
        "",
        f"Backend `{args.backend}`, {args.n} gaussians, "
        f"{args.height}x{args.width}, {args.iters} iters/point. "
        "CPU-mesh numbers measure the exchange-overhead shape, not chip "
        "throughput (see tools/mp_scaling_table.py). Each size runs the "
        "FULL-capacity exchange and the compacted top-K exchange "
        "(fit_distributed's auto policy); `exchange` is bytes-on-wire "
        "per step (gaussian_sharded.exchange_bytes_per_step), `ovf` the "
        "splats dropped by the K budget (0 = lossless).",
        "",
        "| devices | mesh | exchange mode | exchange MB/step | ovf "
        "| step ms | pixels/s | scaling eff. |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for nd, shape, ms, px, tag, xb, ovf in rows:
        eff = px / (base * nd)
        lines.append(f"| {nd} | {shape} | {tag} | {xb / 1e6:.2f} | {ovf} "
                     f"| {ms:.1f} | {px:,.0f} | {eff * 100:.0f}% |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

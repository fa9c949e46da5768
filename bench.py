"""Headline benchmark: pixels/s/chip, forward+backward, 1M Gaussians.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against 1.0e8 pixels/s fwd+bwd — the reference
CUDA stack's (gsplat `rasterize_to_pixels` + `fully_fused_projection`,
/root/reference/internal/renderers/gsplat_v1_renderer.py) published-class
throughput at 1M Gaussians / ~1080p on a modern datacenter GPU
(~50 train iters/s x 2.1MP). The reference repo itself publishes no numeric
tables (SURVEY.md §6), so this constant is the stand-in baseline.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PIXELS_PER_S = 1.0e8


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.gaussian import GaussianState
    from gsl_tpu.renderers.tile_renderer import TileRendererConfig
    from gsl_tpu.training.metrics import train_loss

    H = int(os.environ.get("BENCH_H", "1088"))
    W = int(os.environ.get("BENCH_W", "1920"))
    n = int(os.environ.get("BENCH_N", "1000000"))
    cap = 1
    while cap < n:
        cap <<= 1
    sh_degree = 3
    state = _synthetic_state(n, cap, sh_degree=sh_degree, seed=0)
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fx=1600.0, fy=1600.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    isect_cap = os.environ.get("BENCH_ISECT_CAP")
    if isect_cap is None:
        # probe the intersection count once and size capacity 1.3x over it
        # (mirrors the adaptive-capacity policy of the training loop)
        from gsl_tpu.ops.projection import project_gaussians, tile_rect

        proj = jax.jit(lambda: project_gaussians(
            state.params.means, jnp.exp(state.params.scales),
            state.params.rotations, cam.world_to_camera, cam.fx, cam.fy,
            cam.cx, cam.cy, W, H))()
        rmin, rmax = tile_rect(proj, 16, -(-W // 16), -(-H // 16))
        counts = (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
        total = int(jnp.sum(counts))
        # slot budget includes the one dummy slot per culled gaussian, sized
        # tight (sort cost is linear in capacity) and rounded to the expand
        # block
        padded = int(jnp.sum(jnp.maximum(counts, 1)))
        cap_i = -(-int(padded * 1.08) // 1024) * 1024
        print(f"# isects={total} padded={padded} capacity={cap_i}",
              file=sys.stderr)
    else:
        cap_i = int(isect_cap)
    renderer = TileRendererConfig(
        max_per_tile=4096, chunk=128,
        pallas_chunk=int(os.environ.get("BENCH_CHUNK", "128")),
        min_isect_capacity=cap_i, isect_capacity_factor=1,
        tile_based_culling=os.environ.get("BENCH_CULL", "0") == "1",
    ).instantiate()
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((H, W, 3), 0.4, jnp.float32)

    def loss_fn(params, alive):
        out = renderer.forward(
            GaussianState(params=params, alive=alive), cam, H, W, bg,
            sh_degree)
        loss, _ = train_loss(out.render, target)
        return loss

    step = jax.jit(jax.value_and_grad(loss_fn))

    # warmup / compile
    loss, grads = step(state.params, state.alive)
    jax.block_until_ready(grads)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(state.params, state.alive)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = H * W / dt
    print(json.dumps({
        "metric": "pixels/s/chip fwd+bwd @1M gaussians 1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()

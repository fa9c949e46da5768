"""Headline benchmark: pixels/s/chip, forward+backward, 1M Gaussians.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against 1.0e8 pixels/s fwd+bwd — the reference
CUDA stack's (gsplat `rasterize_to_pixels` + `fully_fused_projection`,
/root/reference/internal/renderers/gsplat_v1_renderer.py) published-class
throughput at 1M Gaussians / ~1080p on a modern datacenter GPU
(~50 train iters/s x 2.1MP). The reference repo itself publishes no numeric
tables (SURVEY.md §6), so this constant is the stand-in baseline.

Resilience: the TPU tunnel in this environment can wedge for hours (even
`jax.devices()` hangs). Before importing jax in-process we health-check the
backend in a SUBPROCESS under a hard timeout, retrying with backoff for up
to BENCH_HEALTH_BUDGET seconds (default 900). If the backend never comes
up, or the bench itself fails, we still print one well-formed JSON line
with an "error" field instead of crashing with no record.
"""
import json
import os
import subprocess
import sys
import time

BASELINE_PIXELS_PER_S = 1.0e8
METRIC = "pixels/s/chip fwd+bwd @1M gaussians 1080p"
LAST_RECORD = {}


def emit(value, vs_baseline, error=None):
    rec = {
        "metric": METRIC,
        "value": value,
        "unit": "pixels/s",
        "vs_baseline": vs_baseline,
    }
    if error is not None:
        rec["error"] = error
    LAST_RECORD.clear()
    LAST_RECORD.update(rec)
    print(json.dumps(rec))


def backend_healthy(timeout_s=45):
    """Probe jax backend init in a subprocess (a wedged tunnel hangs even
    jax.devices(); in-process there is no way back)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform, len(d))"],
            timeout=timeout_s, capture_output=True, text=True,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return False, "health probe timed out (%ds)" % timeout_s
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()
        return False, tail[-1] if tail else "probe rc=%d" % proc.returncode
    print("# backend: %s" % proc.stdout.strip(), file=sys.stderr)
    return True, None


def wait_for_backend():
    budget = float(os.environ.get("BENCH_HEALTH_BUDGET", "900"))
    probe_timeout = int(os.environ.get("BENCH_HEALTH_PROBE_TIMEOUT", "60"))
    deadline = time.monotonic() + budget
    delay = 15.0
    last_err = "no probe ran"
    attempt = 0
    while True:
        attempt += 1
        ok, err = backend_healthy(probe_timeout)
        if ok:
            return True, None
        last_err = err
        remaining = deadline - time.monotonic()
        print("# health probe %d failed: %s (%.0fs budget left)"
              % (attempt, err, remaining), file=sys.stderr)
        if remaining <= 0:
            return False, last_err
        time.sleep(min(delay, max(remaining, 0)))
        delay = min(delay * 2, 120.0)


def run_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
        # probe the intersection count once and size capacity 1.08x over it
        # (mirrors the adaptive-capacity policy of the training loop)
        from gsl_tpu.ops.projection import project_gaussians, tile_rect

        tile = int(os.environ.get("BENCH_TILE", "16"))
        proj = jax.jit(lambda: project_gaussians(
            state.params.means, jnp.exp(state.params.scales),
            state.params.rotations, cam.world_to_camera, cam.fx, cam.fy,
            cam.cx, cam.cy, W, H))()
        rmin, rmax = tile_rect(proj, tile, -(-W // tile), -(-H // tile))
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
    # chained scalar fetch: device-round-trip timing is unreliable through
    # the tunnel for sub-ms work, but a 10-iter steady-state loop ending in
    # a scalar fetch bounds the true wall-clock from above.
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = H * W / dt
    emit(round(pixels_per_s, 1),
         round(pixels_per_s / BASELINE_PIXELS_PER_S, 4))


def run_bench_surfel():
    """2DGS line: Pallas surfel kernel fwd+bwd px/s on the bench scene
    (reference fast path: internal/renderers/vanilla_2dgs_renderer.py).
    Selected by --surfel; emits its own JSON record."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.gaussian import GaussianState
    from gsl_tpu.renderers.surfel_renderer import SurfelRendererConfig
    from gsl_tpu.training.metrics import train_loss

    global METRIC
    METRIC = "surfel(2DGS) pixels/s/chip fwd+bwd @1M gaussians 1080p"
    H = int(os.environ.get("BENCH_H", "1088"))
    W = int(os.environ.get("BENCH_W", "1920"))
    n = int(os.environ.get("BENCH_N", "1000000"))
    cap = 1
    while cap < n:
        cap <<= 1
    state = _synthetic_state(n, cap, sh_degree=3, seed=0)
    # 2DGS model: 2-dim scales (gaussian_2d.py)
    params = state.params.replace(scales=state.params.scales[:, :2])
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fx=1600.0, fy=1600.0,
                      cx=W / 2, cy=H / 2, width=W, height=H)
    cap_i = int(os.environ.get("BENCH_SURFEL_ISECT_CAP", str(1 << 22)))
    renderer = SurfelRendererConfig(
        min_isect_capacity=cap_i, isect_capacity_factor=1,
        pallas_chunk=int(os.environ.get("BENCH_CHUNK", "128")),
    ).instantiate()
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((H, W, 3), 0.4, jnp.float32)

    def loss_fn(p, alive):
        out = renderer.forward(GaussianState(params=p, alive=alive),
                               cam, H, W, bg, 3)
        loss, _ = train_loss(out.render, target)
        # the 2DGS regularizers pull their grads through the extra
        # accumulator outputs (gs2d_metrics.py: distortion + normal)
        loss = loss + 1e-3 * jnp.mean(out.rend_dist)
        return loss

    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = step(params, state.alive)
    jax.block_until_ready(grads)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(params, state.alive)
    jax.block_until_ready(grads)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    pixels_per_s = H * W / dt
    emit(round(pixels_per_s, 1),
         round(pixels_per_s / BASELINE_PIXELS_PER_S, 4))


RECORD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_RECORD.json")


def check_regression(rec):
    """--check mode: compare the fresh measurement against the recorded
    number (BENCH_RECORD.json) and fail on a >20% drop — the perf
    regression guard (VERDICT r2 'next' #7). Use --record to update the
    recorded number after an intentional change."""
    if rec.get("error") or not rec.get("value"):
        print("# check skipped: no valid measurement", file=sys.stderr)
        return 0
    if not os.path.exists(RECORD_PATH):
        print("# no BENCH_RECORD.json; run with --record first",
              file=sys.stderr)
        return 0
    with open(RECORD_PATH) as f:
        recorded = json.load(f)
    ref = float(recorded.get("value", 0.0))
    if ref <= 0:
        return 0
    ratio = rec["value"] / ref
    print("# regression check: %.3g vs recorded %.3g (%.1f%%)"
          % (rec["value"], ref, 100 * ratio), file=sys.stderr)
    if ratio < 0.8:
        print("# FAIL: throughput dropped >20%% vs BENCH_RECORD.json",
              file=sys.stderr)
        return 1
    return 0


def main(argv):
    ok, err = wait_for_backend()
    if not ok:
        emit(0.0, 0.0, error="backend unavailable: %s" % err)
        return 0
    try:
        if "--surfel" in argv:
            run_bench_surfel()
        else:
            run_bench()
    except Exception as e:  # noqa: BLE001 - always leave a JSON record
        import traceback
        traceback.print_exc()
        emit(0.0, 0.0, error="%s: %s" % (type(e).__name__, e))
        return 0
    last = dict(LAST_RECORD)
    if "--record" in argv and last.get("value"):
        with open(RECORD_PATH, "w") as f:
            json.dump(last, f, indent=1)
        print("# recorded %.3g to %s" % (last["value"], RECORD_PATH),
              file=sys.stderr)
    if "--check" in argv:
        return check_regression(last)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

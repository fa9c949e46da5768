"""Converged-scale quality evidence for QUALITY.md (VERDICT round-3 ask #2).

Mip-NeRF 360 is not fetchable in this environment (no egress), so the
quality gate runs on a HARD SYNTHETIC: ground truth comes from rendering a
dense high-frequency teacher scene (up to millions of anisotropic
gaussians, SH degree 3) from many viewpoints; a student then trains from a
sparse random init with the FULL reference densification schedule
(30k steps, densify [500, 15k], opacity reset 3k —
reference internal/density_controllers/vanilla_density_controller.py:14-27).
Because the target is exactly representable, the final PSNR isolates the
renderer+optimizer stack's fidelity at scale. Also reports:

- converged fast-vs-exact compositing delta: the SAME converged model
  evaluated with the fast path (bf16-packed sort payloads, default-precision
  matmuls) and the exact path (f32 + HIGHEST + exact (tile, f32-depth)
  lexicographic sort),
- fast-vs-exact short TRAINING runs,
- packed-key vs exact-sort image AND gradient diff at 1M-gaussian/1080p
  bench scale (VERDICT r3 weak #4 — the direct measurement),
- depth-key tie rate at bench scale,
- short STP (stp.yaml: tile culling + per-pixel resort) and 2DGS
  (gs2d.yaml: surfel kernel) training runs through the same protocol —
  on-TPU evidence for both kernel variants (VERDICT r3 ask #4).

Usage (round-4 converged protocol, ~1 h on one v5e):
  python tools/quality_benchmark.py --teacher-n 1000000 --res 512 \
      --steps 30000
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "gsl_tpu",
                       "configs")


def make_teacher(n, seed=0):
    import jax.numpy as jnp
    from gsl_tpu.models.gaussian import GaussianParams, GaussianState
    from gsl_tpu.ops.sh import num_sh_bases

    rng = np.random.RandomState(seed)
    k = num_sh_bases(3)
    # clustered blobs + fine structure: high-frequency content
    centers = rng.uniform(-1.5, 1.5, (60, 3))
    which = rng.randint(0, 60, n)
    means = centers[which] + rng.normal(0, 0.15, (n, 3))
    scales = rng.uniform(-6.5, -4.0, (n, 3))
    quats = rng.normal(size=(n, 4))
    shs_dc = rng.normal(size=(n, 1, 3)) * 0.8
    shs_rest = rng.normal(size=(n, k - 1, 3)) * 0.15
    opac = rng.uniform(-2.0, 2.0, (n, 1))
    params = GaussianParams(
        means=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        shs_dc=jnp.asarray(shs_dc, jnp.float32),
        shs_rest=jnp.asarray(shs_rest, jnp.float32))
    return GaussianState(params=params,
                         alive=jnp.ones((n,), bool))


def orbit_cameras(n_views, res, radius=4.5, seed=1):
    from gsl_tpu.data.cameras import make_camera

    rng = np.random.RandomState(seed)
    cams = []
    for i in range(n_views):
        yaw = 2 * np.pi * i / n_views + rng.uniform(-0.1, 0.1)
        pitch = rng.uniform(-0.55, -0.05)
        c = radius * np.array([np.cos(pitch) * np.sin(yaw),
                               np.sin(pitch),
                               np.cos(pitch) * np.cos(yaw)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd])
        cams.append(make_camera(R=R, T=-R @ c, fx=0.9 * res, fy=0.9 * res,
                                cx=res / 2, cy=res / 2, width=res,
                                height=res))
    return cams


def sort_diff_at_bench_scale():
    """Packed-key vs exact (tile, f32-depth) lexicographic sort: image and
    means2d-gradient diffs on the 1M-gaussian/1080p bench scene, plus the
    adjacent-key tie rate."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_state
    from gsl_tpu.data.cameras import make_camera as mc
    from gsl_tpu.ops import rasterize_pallas as rp
    from gsl_tpu.ops.projection import project_gaussians
    from gsl_tpu.ops.sh import sh_to_rgb

    H, W, n = 1088, 1920, 1_000_000
    st = _synthetic_state(n, 1 << 20, sh_degree=1, seed=0)
    cam = mc(R=np.eye(3), T=np.zeros(3), fx=1600., fy=1600., cx=W / 2,
             cy=H / 2, width=W, height=H)
    p = st.params
    proj = jax.jit(lambda: project_gaussians(
        p.means, jnp.exp(p.scales), p.rotations, cam.world_to_camera,
        cam.fx, cam.fy, cam.cx, cam.cy, W, H))()
    tiles_x, tiles_y = -(-W // 16), -(-H // 16)
    depth_bits = 32 - max(int(np.ceil(
        np.log2(tiles_x * tiles_y + 1))), 1)
    cap_i = 1 << 22
    isects = rp.isect_encode_padded(proj, H, W, 16, capacity=cap_i)
    opac = jax.nn.sigmoid(p.opacities[:, 0])
    dirs = p.means - jnp.linalg.inv(cam.world_to_camera)[:3, 3]
    colors = jnp.clip(sh_to_rgb(
        jnp.concatenate([p.shs_dc, p.shs_rest], 1), dirs, 1) + 0.5, 0.0,
        None)
    interp = jax.default_backend() != "tpu"

    def render(m2d, exact):
        img, alpha = rp.rasterize_pallas(
            m2d, proj.conics, opac, colors, jnp.zeros_like(m2d), isects,
            H, W, 16, 128, interp, cap_i, False, False, False,
            exact)
        return img, alpha

    def loss(m2d, exact):
        img, alpha = render(m2d, exact)
        return jnp.sum(img * img) + jnp.sum(alpha)

    img_p, _ = jax.jit(lambda: render(proj.means2d, False))()
    img_e, _ = jax.jit(lambda: render(proj.means2d, True))()
    g_p = jax.jit(jax.grad(lambda m: loss(m, False)))(proj.means2d)
    g_e = jax.jit(jax.grad(lambda m: loss(m, True)))(proj.means2d)
    di = np.abs(np.asarray(img_p) - np.asarray(img_e))
    gp, ge = np.asarray(g_p), np.asarray(g_e)
    dg = np.abs(gp - ge)
    gn = np.abs(ge).mean()

    # tie rate of the packed keys (adjacent sorted slots colliding)
    keys = jax.jit(lambda: rp._expand_sorted(
        proj.means2d, proj.conics, opac, colors, isects, cap_i, 16,
        tiles_x, tiles_y, depth_bits, False, interp)[0])()
    k = np.asarray(keys)
    n_real = int(np.searchsorted(k, np.uint32(tiles_x * tiles_y)
                                 << depth_bits))
    kr = k[:n_real]
    ties = float(np.mean(kr[1:] == kr[:-1]))
    return {"img_max_diff": float(di.max()),
            "img_mean_diff": float(di.mean()),
            "px_changed_pct": float((di.max(-1) > 1 / 255).mean() * 100),
            "grad_max_diff": float(dg.max()),
            "grad_rel_mean_diff": float(dg.mean() / max(gn, 1e-30)),
            "depth_bits": depth_bits, "tie_rate": ties,
            "n_isects": n_real}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--teacher-n", type=int, default=1_000_000)
    ap.add_argument("--fast-steps", type=int, default=1500)
    ap.add_argument("--variant-steps", type=int, default=2000,
                    help="short STP / 2DGS runs (0 = skip)")
    ap.add_argument("--gs2d-steps", type=int, default=0,
                    help="steps for the gs2d variant (0 = --variant-"
                         "steps). Surfel slot demand grows ~tiles*n (no "
                         "tile culling + edge-on AABBs), so the gs2d "
                         "line trains shorter/lower-res than stp")
    ap.add_argument("--gs2d-res", type=int, default=0,
                    help="resolution for the gs2d variant (0 = --res). "
                         "Surfels have no peak-alpha tile culling, and "
                         "near-edge-on disks have pathological AABBs — "
                         "at 512^2 the isect demand can exceed the 2^24 "
                         "slot limit (NOTES_ROUND5), so the gs2d line "
                         "runs at a smaller resolution with its own "
                         "teacher renders of the SAME teacher scene")
    ap.add_argument("--skip-sort-diff", action="store_true")
    ap.add_argument("--out", default="QUALITY.md")
    ap.add_argument("--workdir", default="/tmp/gsl_quality")
    ap.add_argument("--round", default="4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gsl_tpu.cli import build_components, load_config
    from gsl_tpu.data.dataparsers.dataparser import (DataParserOutputs,
                                                     ImageSet, PointCloud)
    from gsl_tpu.renderers.tile_renderer import TileRendererConfig
    from gsl_tpu.training.density import VanillaDensityControllerConfig
    from gsl_tpu.training.fit import FitConfig, fit, validate
    from gsl_tpu.training.trainer import Trainer, TrainerConfig
    from gsl_tpu.models.gaussian import VanillaGaussianConfig

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()

    # ---- teacher renders = ground truth ----
    bg = jnp.zeros(3, jnp.float32)
    rng = np.random.RandomState(7)
    pc = PointCloud(xyz=rng.uniform(-2, 2, (20000, 3)).astype(np.float32),
                    rgb=rng.rand(20000, 3).astype(np.float32))

    def build_outputs(res):
        """Teacher views + DataParserOutputs at `res` (cached per res;
        the teacher model only materializes when a view is missing)."""
        cams = orbit_cameras(args.views, res)
        img_dir = os.path.join(
            args.workdir, "images" if res == args.res else f"images{res}")
        os.makedirs(img_dir, exist_ok=True)
        names, paths = [], []
        teacher = render_j = renderer = None
        print(f"rendering {args.views} teacher views at {res} "
              f"({args.teacher_n} gaussians)...", flush=True)
        for i, cam in enumerate(cams):
            name = f"v{i:03d}.png"
            path = os.path.join(img_dir, name)
            if not os.path.exists(path):  # resumable: skip rendered views
                if render_j is None:
                    teacher = make_teacher(args.teacher_n)
                    t_cap = 1 << max(22, int(np.ceil(
                        np.log2(4 * args.teacher_n))))
                    renderer = TileRendererConfig(
                        min_isect_capacity=t_cap).instantiate()
                    render_j = jax.jit(lambda c: renderer.forward(
                        teacher, c, res, res, bg, 3).render)
                out_render = render_j(cam)
                img = (np.clip(np.asarray(out_render), 0, 1)
                       * 255).astype(np.uint8)
                Image.fromarray(img).save(path)
            names.append(name)
            paths.append(path)
        del teacher, render_j, renderer

        cam_batch = jax.tree.map(lambda *xs: jnp.stack(
            [jnp.asarray(x) for x in xs]), *cams)
        val_idx = list(range(0, args.views, 8))
        train_idx = [i for i in range(args.views) if i not in val_idx]

        def subset(idx):
            return ImageSet(image_names=[names[i] for i in idx],
                            image_paths=[paths[i] for i in idx],
                            cameras=cam_batch[np.asarray(idx)])

        return DataParserOutputs(
            train_set=subset(train_idx), val_set=subset(val_idx),
            test_set=subset(val_idx), point_cloud=pc, camera_extent=4.5)

    outputs = build_outputs(args.res)

    def run(tag, steps, fast_math, seed=42, trainer=None,
            densify_until=None, outputs_override=None):
        # phase-result cache: a crashed/restarted protocol run (the axon
        # tunnel can kill the worker mid-phase) resumes without redoing
        # finished phases
        cache = os.path.join(args.workdir, f"result_{tag}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                cached = json.load(f)
            print(f"[cache] {tag}: {cached}", flush=True)
            return None, None, None, cached
        # GSL_QUALITY_MIN_ISECT_CAP pre-sizes the slot capacity (via
        # FitConfig.min_isect_capacity): each adaptive growth retraces
        # the train step while the old executable stays alive, and the
        # axon worker has crashed near growth boundaries in rounds 4 AND
        # 5 (NOTES_ROUND5) — pre-sizing removes the churn at the cost of
        # linearly slower early-step sorts
        mic = int(os.environ.get("GSL_QUALITY_MIN_ISECT_CAP", 1 << 20))
        trainer = trainer or Trainer(
            model=VanillaGaussianConfig(sh_degree=3),
            renderer=TileRendererConfig(min_isect_capacity=1 << 20,
                                        fast_math=fast_math),
            density=VanillaDensityControllerConfig(
                densify_until_iter=(densify_until
                                    or min(int(steps * 0.5), 15000)),
                opacity_reset_interval=3000),
            config=TrainerConfig())
        # resume="auto": a killed/restarted protocol run skips completed
        # phases (fit() loads the end checkpoint and goes straight to
        # validation); wall-clock for resumed phases is reconstructed from
        # the phase's own train_log.csv
        out_dir = os.path.join(args.workdir, tag)
        # periodic saves so a TPU-worker crash mid-phase (axon tunnel,
        # NOTES_ROUND4 fault) resumes from a recent boundary instead of
        # restarting the phase; dense early (small state, and the known
        # fault zone is ~step 1500-2600), sparser once the state is large
        # dense saves THROUGHOUT: the axon client leaks ~8 MB/step host
        # RAM at 512² (NOTES_ROUND5), so long runs are executed as
        # time-boxed attempts (supervisor kills + resumes) — the save
        # cadence bounds the work lost per restart
        saves = (list(range(1000, min(steps, 10000), 1000))
                 + list(range(10000, steps, 2000)))
        # GSL_QUALITY_MIN_CAPACITY pre-sizes the MODEL capacity for the
        # same reason as the isect pre-size above: both round-4 and
        # round-5 worker crashes landed near the 131072 -> 262144 model
        # doubling, i.e. at big-executable retraces (NOTES_ROUND5)
        min_cap = int(os.environ.get("GSL_QUALITY_MIN_CAPACITY", 1 << 15))
        cfg = FitConfig(max_steps=steps, output_dir=out_dir,
                        save_iterations=saves,
                        save_ply=False, min_capacity=min_cap,
                        min_isect_capacity=mic,
                        log_interval=500, resume="auto", seed=seed)
        already_done = os.path.isdir(
            os.path.join(out_dir, "checkpoints", f"step_{steps}"))
        t0 = time.time()
        state, results = fit(trainer, outputs_override or outputs, cfg,
                             val_at_end=True)
        minutes = (time.time() - t0) / 60.0
        if already_done:  # resumed complete phase: recompute from log
            import csv as _csv
            with open(os.path.join(out_dir, "train_log.csv")) as f:
                rows = [r for r in _csv.reader(f)][1:]
            secs = sum(float(cfg.log_interval) / max(float(r[3]), 1e-6)
                       for r in rows if len(r) >= 4)
            minutes = secs / 60.0
        rec = {"psnr": results["psnr"], "ssim": results["ssim"],
               "lpips": results.get("lpips", float("nan")),
               "n_gaussians": int(state.gaussians.n_alive),
               "minutes": minutes}
        with open(cache, "w") as f:
            json.dump(rec, f, default=float)
        return state, trainer, cfg, rec

    print(f"== full run: {args.steps} steps (fast mode) ==", flush=True)
    state_f, trainer_f, cfg_f, full = run("full", args.steps, True)
    print(full, flush=True)

    # converged fast-vs-exact: evaluate the SAME converged model with the
    # exact compositing + exact-sort renderer
    conv_cache = os.path.join(args.workdir, "result_conv_exact.json")
    if os.path.exists(conv_cache):
        with open(conv_cache) as f:
            conv_exact = json.load(f)
        print(f"[cache] conv_exact: {conv_exact}", flush=True)
    else:
        assert state_f is not None, \
            "full phase cached but conv_exact missing: delete " \
            "result_full.json to recompute both"
        exact_trainer = Trainer(
            model=VanillaGaussianConfig(sh_degree=3),
            renderer=TileRendererConfig(min_isect_capacity=1 << 20,
                                        fast_math=False, exact_sort=True),
            density=VanillaDensityControllerConfig(),
            config=TrainerConfig())
        exact_trainer.setup(state_f.gaussians, outputs.camera_extent,
                            outputs.prune_extent)
        conv_exact = validate(exact_trainer, state_f, outputs, cfg_f)
        with open(conv_cache, "w") as f:
            json.dump({k: v for k, v in conv_exact.items()
                       if isinstance(v, (int, float))}, f, default=float)
    print(f"converged eval exact: {conv_exact['psnr']:.3f} dB "
          f"(fast: {full['psnr']:.3f})", flush=True)

    print("== fast vs exact (short training) ==", flush=True)
    _, _, _, fast_short = run("fast", args.fast_steps, True)
    _, _, _, exact_short = run("exact", args.fast_steps, False)
    print("fast:", fast_short, "exact:", exact_short, flush=True)

    # ---- kernel-variant short runs through the real presets ----
    variants = {}
    gs2d_res = args.gs2d_res or args.res
    if args.variant_steps:
        for preset, tag in (("stp.yaml", "stp"), ("gs2d.yaml", "gs2d")):
            print(f"== variant run: {preset} ==", flush=True)
            cfg_d = load_config([os.path.join(CONFIGS, preset)], {})
            v_trainer, _, _ = build_components(cfg_d)
            v_trainer.renderer_cfg.min_isect_capacity = 1 << 20
            ov = (build_outputs(gs2d_res)
                  if tag == "gs2d" and gs2d_res != args.res else None)
            v_steps = (args.gs2d_steps or args.variant_steps) \
                if tag == "gs2d" else args.variant_steps
            try:
                _, _, _, variants[tag] = run(
                    tag, v_steps, True, trainer=v_trainer,
                    densify_until=int(v_steps * 0.5),
                    outputs_override=ov)
                variants[tag]["steps"] = v_steps
            except Exception as e:  # noqa: BLE001 - protocol resilience:
                # one failing variant must not block the whole report
                print(f"[variant {tag}] FAILED: {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(tag, variants[tag], flush=True)

    # ---- packed-key vs exact-sort diff at bench scale ----
    sd = None
    if not args.skip_sort_diff:
        sd_cache = os.path.join(args.workdir, "result_sort_diff.json")
        if os.path.exists(sd_cache):
            with open(sd_cache) as f:
                sd = json.load(f)
            print(f"[cache] sort_diff: {sd}", flush=True)
        else:
            print("== packed vs exact sort diff @1M/1080p ==", flush=True)
            try:
                sd = sort_diff_at_bench_scale()
                with open(sd_cache, "w") as f:
                    json.dump(sd, f, default=float)
            except Exception as e:  # noqa: BLE001 - protocol resilience
                print(f"[sort_diff] FAILED: {type(e).__name__}: {e}",
                      flush=True)
                sd = None
        print(sd, flush=True)

    backend = jax.default_backend()
    total_min = (time.time() - t_start) / 60
    lp = (f"{full['lpips']:.4f}"
          if full["lpips"] == full["lpips"] else "-")
    md = f"""# QUALITY — measured evidence (round {args.round})

Real-scene data (Mip-NeRF 360 garden) is unreachable from this
environment (no network egress), so the quality gate runs the hard
synthetic protocol below on REAL hardware (jax backend: {backend}). All
numbers measured, not projected. Generated by tools/quality_benchmark.py
on {time.strftime('%Y-%m-%d %H:%M')} in {total_min:.1f} min.

## Protocol

Ground truth: {args.views} views at {args.res}x{args.res} rendered from a
dense high-frequency teacher ({args.teacher_n} anisotropic SH-3
gaussians, clustered + fine structure). Student trains from a 20k random
point init with the FULL reference schedule: {args.steps} steps, densify
every 100 in [500, {min(int(args.steps * 0.5), 15000)}], opacity reset
every 3k (vanilla_density_controller.py:14-27). The target is exactly
representable, so final PSNR isolates renderer+optimizer fidelity at
scale.

## Results

| Experiment | steps | PSNR | SSIM | final gaussians | minutes |
|---|---|---|---|---|---|
| full (fast mode) | {args.steps} | {full['psnr']:.2f} | {full['ssim']:.4f} | {full['n_gaussians']} | {full['minutes']:.1f} |
| full model re-evaluated EXACT (f32/HIGHEST/exact-sort) | - | {conv_exact['psnr']:.2f} | {conv_exact['ssim']:.4f} | {full['n_gaussians']} | - |
| short, fast mode | {args.fast_steps} | {fast_short['psnr']:.2f} | {fast_short['ssim']:.4f} | {fast_short['n_gaussians']} | {fast_short['minutes']:.1f} |
| short, exact mode | {args.fast_steps} | {exact_short['psnr']:.2f} | {exact_short['ssim']:.4f} | {exact_short['n_gaussians']} | {exact_short['minutes']:.1f} |
"""
    labels = {
        "stp": f"STP (stp.yaml: culling + per-pixel resort, {args.res}²)",
        "gs2d": f"2DGS (gs2d.yaml: Pallas surfel kernel, {gs2d_res}²)",
    }
    for tag, v in variants.items():
        md += (f"| {labels[tag]} | {v.get('steps', '-')} | "
               f"{v['psnr']:.2f} | {v['ssim']:.4f} | {v['n_gaussians']} |"
               f" {v['minutes']:.1f} |\n")
    md += f"""
Converged fast-vs-exact eval delta:
{full['psnr'] - conv_exact['psnr']:+.3f} dB on the SAME converged model
(fast = bf16-packed sort payloads + default-precision matmuls; exact =
f32 payloads + HIGHEST + exact (tile, f32-depth) lexicographic sort).
Short-training delta: {fast_short['psnr'] - exact_short['psnr']:+.2f} dB.
LPIPS (full run): {lp} (empty when no exported weights in this image).
"""
    if sd is not None:
        md += f"""
## Packed-key vs exact-sort at 1M/1080p (VERDICT r3 weak #4, direct)

Packed 32-bit key (tile | {sd['depth_bits']}-bit depth prefix) vs exact
lexicographic (tile, full f32 depth) sort — same scene, same kernels:

| metric | value |
|---|---|
| image max abs diff | {sd['img_max_diff']:.3e} |
| image mean abs diff | {sd['img_mean_diff']:.3e} |
| pixels changed > 1/255 | {sd['px_changed_pct']:.4f}% |
| means2d grad max abs diff | {sd['grad_max_diff']:.3e} |
| means2d grad mean rel diff | {sd['grad_rel_mean_diff']:.3e} |
| adjacent-key tie rate | {sd['tie_rate'] * 100:.3f}% ({sd['n_isects']} isects) |

Colliding pairs fall back to stable (submission-order) compositing — the
same fallback CUDA radix sorting applies to exact float ties. The
`exact_sort` renderer flag (one extra sort operand) removes the
quantization entirely when desired.
"""
    with open(args.out, "w") as f:
        f.write(md)
    with open(os.path.join(args.workdir, "quality.json"), "w") as f:
        json.dump({"full": full, "conv_exact": conv_exact,
                   "fast_short": fast_short, "exact_short": exact_short,
                   "variants": variants, "sort_diff": sd,
                   "backend": backend}, f, default=float)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

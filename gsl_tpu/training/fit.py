"""End-to-end fit/validate loops — the analogue of `python main.py fit`
(/root/reference/internal/gaussian_splatting.py + internal/cli.py surface).

Responsibilities of the reference Lightning stack reproduced here:
- setup from DataParserOutputs (point-cloud init, camera extent LR scaling),
- the per-step schedule: train_step -> density ops -> SH-degree warmup ->
  periodic hooks (Mip 3D filter, similarity reg, LightGaussian prune),
- checkpointing at save_iterations + train end; PLY export,
- validation loop with PSNR/SSIM, per-image CSV + MEAN row
  (gaussian_splatting.py:546-572).

Variant behavior (which train step runs, which density controller, which
periodic work) is resolved ONCE by `hooks.build_hooks` — the loop body here
is variant-free, mirroring the reference's hook-registry composition
(gaussian_splatting.py:113-117).
"""
from __future__ import annotations

import csv
import dataclasses
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataparsers.dataparser import DataParserOutputs
from ..data.dataset import CachedDataset, DataLoader
from ..models.gaussian import VanillaGaussianConfig, GaussianState
from ..models.mip_splatting import MipSplattingConfig, compute_3d_filter
from ..ops.ssim import ssim as ssim_fn
from ..training.trainer import Trainer, TrainState
from ..utils.checkpoint import (find_latest_checkpoint, load_checkpoint,
                                load_checkpoint_meta, save_checkpoint)
from ..utils.ply import save_state_ply
from .hooks import FitContext, build_hooks
from .metrics import psnr as psnr_fn


@dataclasses.dataclass
class FitConfig:
    max_steps: int = 30_000
    save_iterations: Sequence[int] = (7_000, 30_000)
    log_interval: int = 100
    capacity_multiplier: float = 4.0
    min_capacity: int = 1 << 15
    min_isect_capacity: int = 0
    """floor for the adaptive tile-intersection slot capacity. Pre-sizing
    (together with min_capacity) removes mid-run capacity-growth
    retraces of the train step — each retrace compiles another large
    executable on the TPU worker, near which the axon worker has
    repeatedly crashed (NOTES_ROUND5)."""
    seed: int = 42
    output_dir: str = "outputs/run"
    save_ply: bool = True
    add_background_sphere: bool = False
    background_sphere_distance: float = 2.2
    background_sphere_points: int = 204_800
    matmul_precision: str = "highest"
    """TPU f32 matmuls/convs default to bf16 passes; 'highest' recovers
    training quality (+1.3dB on the synthetic e2e benchmark) at modest
    cost — the hot Pallas kernels set their own precision explicitly."""
    tensorboard: bool = False
    logger: str = "none"
    """experiment logger: 'none' | 'tensorboard' | 'wandb' (reference
    --logger, internal/cli.py:112-134); the metrics CSV is always written.
    `tensorboard: true` is kept as an alias for logger=tensorboard."""
    log_val_images: int = 4
    """log up to this many GT|render validation panels per split to the
    chosen logger (reference gaussian_splatting.py:584-620)"""
    lg_prune_steps: Sequence[int] = ()
    """LightGaussian importance-prune steps
    (reference gaussian_splatting.py:399-444)"""
    lg_prune_percent: float = 0.6
    lg_prune_decay: float = 0.6
    lg_n_cameras: int = 8
    size_bucket: int = 64
    """pad images up to multiples of this so mixed-size datasets share
    compiled train steps (masked loss over the padding)"""
    viewer: bool = False
    """serve an in-training web viewer (reference --viewer flag,
    internal/viewer/training_viewer.py); the train loop pumps render
    requests between steps"""
    viewer_port: int = 8080
    resume: str = "auto"
    """'auto': resume from the latest checkpoint under output_dir (the
    reference's `--ckpt_path last` auto-search, internal/cli.py:92-110);
    'never': always start fresh; anything else: explicit checkpoint path."""
    init_from: str = ""
    """initialize the gaussians from an existing artifact (run dir / ply /
    ckpt) instead of the point cloud — the finetune path (reference
    utils/finetune_partition.py); optimizer state starts fresh."""


def _round_capacity(n: int) -> int:
    cap = 1 << 14
    while cap < n:
        cap <<= 1
    return cap


def _init_gaussians(trainer: Trainer, outputs: DataParserOutputs,
                    cfg: FitConfig, capacity_override: int = None):
    """Point-cloud (or init_from artifact) initialization + optional
    background sphere + Mip-Splatting 3D filter. `capacity_override`
    forces the exact model capacity (the resume path uses it to build a
    template matching a checkpoint saved at a smaller capacity)."""
    pc = outputs.point_cloud
    if cfg.add_background_sphere:
        from ..data.dataset import add_background_sphere
        centers = np.stack([
            np.asarray(outputs.train_set.cameras[i].camera_center)
            for i in range(len(outputs.train_set))])
        pc = add_background_sphere(pc, centers,
                                   cfg.background_sphere_distance,
                                   cfg.background_sphere_points)
    capacity = capacity_override or _round_capacity(
        max(int(pc.xyz.shape[0] * cfg.capacity_multiplier),
            cfg.min_capacity))
    gaussians = trainer.model.init_from_pcd(pc.xyz, pc.rgb, capacity)
    if cfg.init_from:
        # finetune: replace the pcd-initialized gaussians with a trained
        # artifact, padded into this run's capacity
        from ..utils.gaussian_model_loader import GaussianModelLoader
        loaded, _, _ = GaussianModelLoader.load(cfg.init_from)
        alive_rows = np.asarray(loaded.alive)
        n_loaded = int(alive_rows.sum())
        capacity = _round_capacity(
            max(int(n_loaded * cfg.capacity_multiplier), cfg.min_capacity))
        arrays = {k: np.asarray(getattr(loaded.params, k))[alive_rows]
                  for k in ("means", "scales", "rotations", "opacities",
                            "shs_dc", "shs_rest")}
        tmpl = trainer.model.init_from_pcd(arrays["means"],
                                           np.zeros_like(arrays["means"]),
                                           capacity)
        new_params = {}
        for k, v in arrays.items():
            buf = np.asarray(getattr(tmpl.params, k)).copy()
            tk = buf.shape[1:]
            if v.shape[1:] != tk:
                raise ValueError(
                    f"init_from artifact field {k} shape {v.shape[1:]} != "
                    f"model template {tk}")
            buf[:n_loaded] = v
            new_params[k] = jnp.asarray(buf)
        gaussians = GaussianState(
            params=type(tmpl.params)(**new_params),
            alive=jnp.asarray(np.arange(capacity) < n_loaded))
        print(f"[fit] init_from {cfg.init_from}: {n_loaded} gaussians, "
              f"capacity {capacity}")

    if isinstance(trainer.model, MipSplattingConfig):
        f3d = compute_3d_filter(gaussians.params.means, gaussians.alive,
                                outputs.train_set.cameras)
        gaussians = GaussianState(params=gaussians.params,
                                  alive=gaussians.alive,
                                  extra={"filter_3d": f3d})
    return gaussians, pc


def _make_viewer(trainer: Trainer, outputs: DataParserOutputs,
                 cfg: FitConfig, bg):
    """In-training web viewer + its orbit-camera render closure."""
    from ..viewer.training_viewer import TrainingViewer
    from ..viewer.viewer import orbit_c2w
    from ..data.cameras import make_camera
    viewer = TrainingViewer(port=cfg.viewer_port).start()
    target = np.stack([
        np.asarray(outputs.train_set.cameras[i].camera_center)
        for i in range(len(outputs.train_set))]).mean(0)

    def render_fn(st, sh_d):
        def render(yaw, pitch, dist):
            S = viewer.image_size
            c2w = orbit_c2w(yaw, pitch, dist, target)
            w2c = np.linalg.inv(c2w)
            f = 0.5 * S / np.tan(np.deg2rad(30.0))
            cam = make_camera(R=w2c[:3, :3], T=w2c[:3, 3], fx=f, fy=f,
                              cx=S / 2, cy=S / 2, width=S, height=S)
            out = trainer.renderer.forward(st.gaussians, cam, S, S, bg,
                                           sh_d)
            return (np.clip(np.asarray(out.render), 0, 1)
                    * 255).astype(np.uint8)
        return render

    return viewer, render_fn


def fit(trainer: Trainer, outputs: DataParserOutputs, cfg: FitConfig,
        val_at_end: bool = True):
    if cfg.resume not in ("auto", "never", "", None) \
            and not os.path.isdir(cfg.resume):
        # fail fast: an explicit path that does not exist should not cost
        # the user minutes of TPU compile before erroring
        raise FileNotFoundError(
            f"fit.resume checkpoint not found: {cfg.resume}")
    os.makedirs(cfg.output_dir, exist_ok=True)
    if cfg.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          cfg.matmul_precision)
    rng = jax.random.PRNGKey(cfg.seed)

    def build_template(capacity_override=None):
        g, pc_ = _init_gaussians(trainer, outputs, cfg, capacity_override)
        s = trainer.setup(g, outputs.camera_extent, outputs.prune_extent)
        if trainer.output_processor is not None:
            s = trainer.init_output_processor(s, len(outputs.train_set))
        return s, pc_

    state, pc = build_template()

    bg = jnp.asarray(trainer.config.background_color, jnp.float32)
    dataset = CachedDataset(outputs.train_set,
                            background=np.asarray(bg, np.float32))
    name_to_idx = {n: i for i, n in
                   enumerate(outputs.train_set.image_names)}
    ctx = FitContext(trainer=trainer, outputs=outputs, dataset=dataset,
                     cfg=cfg, bg=bg, name_to_idx=name_to_idx)
    step_hook, density_hook, pre_density, post_density = build_hooks(
        ctx, int(state.gaussians.n_alive))
    # variant state (SpotLess MLP/histogram, grad-acc buffers) is injected
    # BEFORE resume so the checkpoint template matches the saved tree
    state, rng = step_hook.init_state(state, rng)

    # adaptive tile-intersection capacity: start tight, grow 2x whenever the
    # binning reports drops (bucketed-recompile policy, SURVEY.md hard part 2)
    isect_capacity = _round_capacity(max(8 * pc.xyz.shape[0], 1 << 18,
                                         cfg.min_isect_capacity))
    template_capacity = int(state.params.capacity)

    # ---- mid-training resume (reference --ckpt_path last auto-search) ----
    start_step = 1
    resume_path = None
    if cfg.resume == "auto":
        resume_path = find_latest_checkpoint(
            os.path.join(cfg.output_dir, "checkpoints"))
    elif cfg.resume not in ("never", "", None):
        resume_path = cfg.resume
    if resume_path is not None:
        meta = load_checkpoint_meta(resume_path)
        stored_cap = (meta or {}).get("capacity", state.params.capacity)
        if stored_cap > state.params.capacity:
            # capacity grew since init: the grown template matches the
            # stored shapes
            state = trainer.grow_state(state, stored_cap)
        elif stored_cap < state.params.capacity:
            # checkpoint predates a raised min_capacity: load into a
            # template built at the stored capacity, grow after the load
            state, _ = build_template(capacity_override=stored_cap)
            state, _ = step_hook.init_state(state,
                                            jax.random.PRNGKey(cfg.seed))
        state = load_checkpoint(resume_path, state)
        if int(state.params.capacity) < template_capacity:
            state = trainer.grow_state(state, template_capacity)
        start_step = int(state.step) + 1
        if meta is not None:
            rng = jnp.asarray(np.asarray(meta["rng"], np.uint32))
            isect_capacity = max(
                int(meta.get("isect_capacity", isect_capacity)),
                _round_capacity(cfg.min_isect_capacity)
                if cfg.min_isect_capacity else 0)
        print(f"[fit] resumed {resume_path} -> continuing at {start_step}")
    if start_step > cfg.max_steps:
        print("[fit] checkpoint already at max_steps; nothing to train")

    loader = iter(DataLoader(dataset, seed=cfg.seed, skip=start_step - 1))

    from .loggers import make_logger
    exp_logger = make_logger(
        "tensorboard" if cfg.tensorboard and cfg.logger in ("none", "")
        else cfg.logger, cfg.output_dir)

    training_viewer = None
    if cfg.viewer:
        training_viewer, tv_render_fn = _make_viewer(trainer, outputs, cfg,
                                                     bg)
        # warm the viewer render's jit cache so the first client request
        # does not stall the train loop for a full compile
        try:
            tv_render_fn(state, trainer.sh_degree_at(start_step))(0.0,
                                                                  -15.0,
                                                                  6.0)
        except Exception as e:
            print(f"[fit] viewer warmup render failed: {e}")

    def bucketed(img, img_mask=None):
        """pad HWC image to the size bucket; returns (img, mask|None).
        A per-image mask (1 = keep; reference vanilla_metrics.py:63-67
        zeroes masked pixels in pred and GT) combines with the padding
        mask."""
        b = max(cfg.size_bucket, 1)
        H, W = img.shape[:2]
        Hp, Wp = -(-H // b) * b, -(-W // b) * b
        if Hp == H and Wp == W:
            return img, img_mask
        out = np.zeros((Hp, Wp, 3), img.dtype)
        out[:H, :W] = img
        mask = np.zeros((Hp, Wp), np.float32)
        mask[:H, :W] = 1.0 if img_mask is None else img_mask
        return out, mask

    def ckpt_meta():
        return {"capacity": int(state.params.capacity),
                "rng": np.asarray(rng).tolist(),
                "isect_capacity": int(isect_capacity)}

    def save_at(step):
        save_checkpoint(os.path.join(cfg.output_dir, "checkpoints"), state,
                        step, meta=ckpt_meta())
        if cfg.save_ply:
            save_state_ply(os.path.join(
                cfg.output_dir, "point_cloud",
                f"iteration_{step}", "point_cloud.ply"), state.gaussians)

    isect_cap_warned = False
    log_path = os.path.join(cfg.output_dir, "train_log.csv")
    log_f = open(log_path, "a" if start_step > 1 else "w", newline="")
    logger = csv.writer(log_f)
    if start_step == 1:
        logger.writerow(["step", "loss", "n_gaussians", "steps_per_s"])
    t_last = time.perf_counter()

    for step in range(start_step, cfg.max_steps + 1):
        cam, name, img, img_mask = next(loader)
        img, mask = bucketed(img, img_mask)
        H, W = img.shape[:2]
        sh_degree = trainer.sh_degree_at(step)
        jmask = None if mask is None else jnp.asarray(mask)
        rng, k_step, k1, k2, k_p = jax.random.split(rng, 5)

        state, scalars = step_hook(
            state, k_step, step, sh_degree, cam, name, jnp.asarray(img),
            jmask, H, W, isect_capacity)
        if os.environ.get("GSL_DEBUG_STEPS"):
            # per-step forced sync + state print (axon worker-crash triage)
            print(f"[dbg] step={step} "
                  f"n_dropped={int(scalars['n_dropped_isects'])} "
                  f"n_isects={int(scalars.get('n_isects', -1))} "
                  f"n_alive={int(state.gaussians.n_alive)} "
                  f"loss={float(scalars['loss']):.5f}", flush=True)
        if step % 50 == 0 and int(scalars["n_dropped_isects"]) > 0:
            # 1.5x growth (512-aligned): sort/binning cost is linear in the
            # slot capacity, so over-provisioning is paid on every step.
            # Growth is CAPPED just under the 2^24 exactness limit of the
            # f32 offset pipeline (_resolve_capacity): past it, training
            # continues with dropped intersections and a loud warning —
            # a degraded render beats a hard stop on a static-shape TPU
            # (pathological AABBs, e.g. near-edge-on surfels, can demand
            # unbounded capacity; NOTES_ROUND5)
            new_cap = min(-(-int(isect_capacity * 1.5) // 512) * 512,
                          (1 << 24) - 2048)
            if new_cap != isect_capacity:
                isect_capacity = new_cap
                print(f"[fit] isect capacity -> {isect_capacity}")
            elif not isect_cap_warned:
                isect_cap_warned = True
                print("[fit] WARNING: isect capacity at the 2^24 cap; "
                      f"{int(scalars['n_dropped_isects'])} intersections "
                      "dropped this step (continuing lossy)")

        for plugin in trainer.plugins:
            state = plugin.after_step(state, step)
        for hook in pre_density:
            state = hook.periodic(state, k_p, step)

        if training_viewer is not None \
                and step % training_viewer.pump_interval == 0:
            # fetching scalars syncs the device, so only at pump cadence
            training_viewer.pump(
                step, tv_render_fn(state, sh_degree),
                {"loss": float(scalars["loss"]),
                 "n_gaussians": int(state.gaussians.n_alive)})

        state = density_hook(state, k1, k2, step)
        for hook in post_density:
            state = hook.periodic(state, k_p, step)

        if step % cfg.log_interval == 0:
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            n_g = int(state.gaussians.n_alive)
            logger.writerow([step, float(scalars["loss"]), n_g,
                             round(cfg.log_interval / dt, 2)])
            log_f.flush()
            exp_logger.log_scalars(
                {"train/loss": float(scalars["loss"]),
                 "train/n_gaussians": n_g}, step)

        if step in cfg.save_iterations:
            save_at(step)

    if cfg.max_steps not in cfg.save_iterations \
            and start_step <= cfg.max_steps:
        save_at(cfg.max_steps)
    log_f.close()

    results = None
    if val_at_end and len(outputs.val_set) > 0:
        results = validate(trainer, state, outputs, cfg,
                           exp_logger=exp_logger)
        exp_logger.log_scalars(
            {f"val/{k}": v for k, v in results.items()
             if isinstance(v, float) and v == v}, int(state.step))
    exp_logger.finish()
    return state, results


def validate(trainer: Trainer, state: TrainState,
             outputs: DataParserOutputs, cfg: FitConfig,
             split: str = "val", save_images: bool = False,
             exp_logger=None):
    """Per-image PSNR/SSIM + CSV with MEAN row
    (reference gaussian_splatting.py:546-572). With an `exp_logger`, the
    first `cfg.log_val_images` GT|render panels are also logged
    (reference logs them to TB/W&B, gaussian_splatting.py:584-620)."""
    image_set = (outputs.val_set if split == "val" else outputs.test_set)
    bg = jnp.asarray(trainer.config.background_color, jnp.float32)
    dataset = CachedDataset(image_set, background=np.asarray(bg, np.float32))
    sh_degree = trainer.model.sh_degree

    rows = []
    img_dir = os.path.join(cfg.output_dir, split)
    if save_images:
        os.makedirs(img_dir, exist_ok=True)
    from ..ops.lpips import get_lpips_fn
    lpips_fn = get_lpips_fn()
    if lpips_fn is None:
        print("[validate] lpips unavailable (no exported weights); "
              "lpips column will be empty")
    for i in range(len(dataset)):
        cam, name, img, img_mask = dataset.get(i)
        H, W = img.shape[:2]
        render, m = trainer.eval_step(state, cam, jnp.asarray(img), H, W,
                                      sh_degree, bg)
        gt = jnp.asarray(img)
        if img_mask is not None:
            # masked pixels excluded from all metrics (reference
            # vanilla_metrics.py:63-67 applies the mask in validation too)
            mk = jnp.asarray(img_mask)[..., None]
            gt = gt * mk
            render = render * mk
            mse = jnp.sum((render - gt) ** 2) / jnp.maximum(
                jnp.sum(mk) * 3.0, 1.0)
            psnr = float(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
        else:
            psnr = float(m["psnr"])
        s = float(ssim_fn(gt.transpose(2, 0, 1),
                          render.transpose(2, 0, 1)))
        lp = (float(lpips_fn(render, gt))
              if lpips_fn is not None else None)
        rows.append([name, psnr, s, lp])
        log_this = (exp_logger is not None
                    and i < getattr(cfg, "log_val_images", 0))
        if save_images or log_this:
            side = np.concatenate([img, np.asarray(render)], axis=1)
            side = (np.clip(side, 0, 1) * 255).astype(np.uint8)
            if save_images:
                from PIL import Image
                Image.fromarray(side).save(
                    os.path.join(img_dir, name.replace("/", "_") + ".png"))
            if log_this:
                exp_logger.log_image(f"{split}/{name}", side,
                                     int(state.step))

    metrics_dir = os.path.join(cfg.output_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    csv_path = os.path.join(metrics_dir, f"{split}.csv")
    have_lpips = lpips_fn is not None
    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["name", "psnr", "ssim",
                     "lpips" if have_lpips else "lpips(unavailable)"])
        wr.writerows([[r[0], r[1], r[2], r[3] if have_lpips else ""]
                      for r in rows])
        mean_psnr = float(np.mean([r[1] for r in rows]))
        mean_ssim = float(np.mean([r[2] for r in rows]))
        mean_lpips = (float(np.mean([r[3] for r in rows]))
                      if have_lpips else float("nan"))
        wr.writerow(["MEAN", mean_psnr, mean_ssim,
                     mean_lpips if have_lpips else ""])
    return {"psnr": mean_psnr, "ssim": mean_ssim, "lpips": mean_lpips,
            "csv": csv_path}

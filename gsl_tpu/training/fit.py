"""End-to-end fit/validate loops — the analogue of `python main.py fit`
(/root/reference/internal/gaussian_splatting.py + internal/cli.py surface).

Responsibilities of the reference Lightning stack reproduced here:
- setup from DataParserOutputs (point-cloud init, camera extent LR scaling),
- the per-step schedule: train_step -> density ops (vanilla ADC or MCMC) ->
  SH-degree warmup -> model hooks (Mip-Splatting 3D filter recompute),
- checkpointing at save_iterations + train end; PLY export,
- validation loop with PSNR/SSIM, per-image CSV + MEAN row
  (gaussian_splatting.py:546-572).
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
from ..training.mcmc import (MCMCDensityControllerConfig, mcmc_densify,
                             mcmc_noise_step)
from ..training.trainer import Trainer, TrainState
from ..utils.checkpoint import (find_latest_checkpoint, load_checkpoint,
                                load_checkpoint_meta, save_checkpoint)
from ..utils.ply import save_state_ply
from .metrics import psnr as psnr_fn
from .schedulers import exponential_decay


@dataclasses.dataclass
class FitConfig:
    max_steps: int = 30_000
    save_iterations: Sequence[int] = (7_000, 30_000)
    log_interval: int = 100
    capacity_multiplier: float = 4.0
    min_capacity: int = 1 << 15
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

    # ---- init model from point cloud ----
    pc = outputs.point_cloud
    if cfg.add_background_sphere:
        from ..data.dataset import add_background_sphere
        centers = np.stack([
            np.asarray(outputs.train_set.cameras[i].camera_center)
            for i in range(len(outputs.train_set))])
        pc = add_background_sphere(pc, centers,
                                   cfg.background_sphere_distance,
                                   cfg.background_sphere_points)
    capacity = _round_capacity(
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

    is_mip = isinstance(trainer.model, MipSplattingConfig)
    train_cams = outputs.train_set.cameras
    if is_mip:
        f3d = compute_3d_filter(gaussians.params.means, gaussians.alive,
                                train_cams)
        gaussians = GaussianState(params=gaussians.params,
                                  alive=gaussians.alive,
                                  extra={"filter_3d": f3d})

    state = trainer.setup(gaussians, outputs.camera_extent,
                          outputs.prune_extent)
    if trainer.output_processor is not None:
        state = trainer.init_output_processor(state,
                                              len(outputs.train_set))
    name_to_idx = {n: i for i, n in
                   enumerate(outputs.train_set.image_names)}
    is_mcmc = isinstance(trainer.density_cfg, MCMCDensityControllerConfig)
    from .density import (BackgroundRemovalDensityControllerConfig,
                          StaticDensityControllerConfig,
                          background_removal_step)
    is_static_dc = isinstance(trainer.density_cfg,
                              StaticDensityControllerConfig)
    from .gns import (GNSController, GNSDensityControllerConfig,
                      edge_weighted_blend_scores, final_budget_prune,
                      gns_budget_at, gns_densify, make_gns_step,
                      prune_by_opacity)
    is_gns = isinstance(trainer.density_cfg, GNSDensityControllerConfig)
    if is_gns:
        gns_cfg = trainer.density_cfg
        gns_ctl = GNSController(gns_cfg)
        gns_step = make_gns_step(trainer, gns_cfg)
        gns_n_alive = int(state.gaussians.n_alive)

        def _gns_densify(st, key, step):
            nonlocal gns_n_alive
            from .taming import get_edges
            d = gns_cfg
            if d.edge_aware:
                n_cams = min(d.n_sample_cameras, len(outputs.train_set))
                sel = np.random.RandomState(step).permutation(
                    len(outputs.train_set))[:n_cams]
                cams_s, edges = [], []
                for i in sel:
                    cam_i, _, img_i, _ = dataset.get(int(i))
                    cams_s.append(cam_i)
                    edges.append(get_edges(jnp.asarray(img_i)))
                importance = edge_weighted_blend_scores(
                    trainer.renderer, st.gaussians, cams_s, edges, bg,
                    trainer.sh_degree_at(step))
            else:
                importance = jnp.where(
                    st.density.denom > 0,
                    st.density.grad_accum
                    / jnp.maximum(st.density.denom, 1.0), 0.0)
            budget = jnp.asarray(gns_budget_at(d, step), jnp.int32)
            gstate, opt_state, dstate, n_trunc = gns_densify(
                key, st.gaussians, st.opt_state, st.density, d,
                importance, budget)
            if int(n_trunc) > 0:
                st2 = trainer.grow_state(st, 2 * st.params.capacity)
                pad = jnp.zeros((st2.params.capacity
                                 - importance.shape[0],), jnp.float32)
                gstate, opt_state, dstate, _ = gns_densify(
                    key, st2.gaussians, st2.opt_state, st2.density, d,
                    jnp.concatenate([importance, pad]), budget)
            st = st.replace(params=gstate.params, alive=gstate.alive,
                            opt_state=opt_state, density=dstate,
                            extra=gstate.extra)
            gns_n_alive = int(gstate.n_alive)
            return st
    bg_removal_cfg = (trainer.density_cfg if isinstance(
        trainer.density_cfg, BackgroundRemovalDensityControllerConfig)
        else None)
    if bg_removal_cfg is not None:
        cam_centers = np.stack([
            np.asarray(outputs.train_set.cameras[i].camera_center)
            for i in range(len(outputs.train_set))])
        br_center = cam_centers.mean(0)
        br_radius = (np.linalg.norm(cam_centers - br_center, axis=-1).max()
                     * bg_removal_cfg.foreground_radius_scaling)
    means_lr_sched = exponential_decay(
        lr_init=trainer.model.optimization.means_lr_init
        * trainer.cameras_extent,
        lr_final=trainer.model.optimization.means_lr_init
        * trainer.model.optimization.means_lr_final_factor
        * trainer.cameras_extent,
        max_steps=trainer.model.optimization.means_lr_max_steps)

    # adaptive tile-intersection capacity: start tight, grow 2x whenever the
    # binning reports drops (bucketed-recompile policy, SURVEY.md hard part 2)
    isect_capacity = _round_capacity(max(8 * pc.xyz.shape[0], 1 << 18))

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
        if stored_cap != state.params.capacity:
            # capacity only ever grows from the initial value, so the grown
            # template matches the stored shapes
            state = trainer.grow_state(state, stored_cap)
        state = load_checkpoint(resume_path, state)
        start_step = int(state.step) + 1
        if meta is not None:
            rng = jnp.asarray(np.asarray(meta["rng"], np.uint32))
            isect_capacity = int(meta.get("isect_capacity", isect_capacity))
        print(f"[fit] resumed {resume_path} -> continuing at {start_step}")
    if start_step > cfg.max_steps:
        print("[fit] checkpoint already at max_steps; nothing to train")

    bg = jnp.asarray(trainer.config.background_color, jnp.float32)
    dataset = CachedDataset(outputs.train_set,
                            background=np.asarray(bg, np.float32))
    loader = iter(DataLoader(dataset, seed=cfg.seed, skip=start_step - 1))

    tb_writer = None
    if cfg.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(os.path.join(cfg.output_dir, "tb"))
        except Exception as e:
            print(f"[fit] tensorboard unavailable: {e}")

    training_viewer = None
    if cfg.viewer:
        from ..viewer.training_viewer import TrainingViewer
        from ..viewer.viewer import orbit_c2w
        from ..data.cameras import make_camera
        training_viewer = TrainingViewer(port=cfg.viewer_port).start()
        _tv_target = np.stack([
            np.asarray(outputs.train_set.cameras[i].camera_center)
            for i in range(len(outputs.train_set))]).mean(0)

        def _tv_render_fn(st, sh_d):
            def render(yaw, pitch, dist):
                S = training_viewer.image_size
                c2w = orbit_c2w(yaw, pitch, dist, _tv_target)
                w2c = np.linalg.inv(c2w)
                f = 0.5 * S / np.tan(np.deg2rad(30.0))
                cam = make_camera(R=w2c[:3, :3], T=w2c[:3, 3], fx=f, fy=f,
                                  cx=S / 2, cy=S / 2, width=S, height=S)
                out = trainer.renderer.forward(
                    st.gaussians, cam, S, S, bg, sh_d)
                return (np.clip(np.asarray(out.render), 0, 1)
                        * 255).astype(np.uint8)
            return render

        # warm the viewer render's jit cache so the first client request
        # does not stall the train loop for a full compile
        try:
            _tv_render_fn(state, trainer.sh_degree_at(start_step))(0.0,
                                                                   -15.0,
                                                                   6.0)
        except Exception as e:
            print(f"[fit] viewer warmup render failed: {e}")

    log_path = os.path.join(cfg.output_dir, "train_log.csv")
    log_f = open(log_path, "a" if start_step > 1 else "w", newline="")
    logger = csv.writer(log_f)
    if start_step == 1:
        logger.writerow(["step", "loss", "n_gaussians", "steps_per_s"])

    t_last = time.perf_counter()
    mcmc_cfg = trainer.density_cfg if is_mcmc else None

    @jax.jit
    def _mcmc_density(state: TrainState, key):
        gstate, opt_state, n_new = mcmc_densify(
            key, state.gaussians, state.opt_state, mcmc_cfg)
        return state.replace(params=gstate.params, alive=gstate.alive,
                             opt_state=opt_state, extra=gstate.extra), n_new

    @jax.jit
    def _mcmc_noise(state: TrainState, key, lr):
        gstate = mcmc_noise_step(key, state.gaussians, lr,
                                 mcmc_cfg.noise_lr if mcmc_cfg else 5e5)
        return state.replace(params=gstate.params)

    from .opt_strategies import GradAccTrainer
    from .appearance_trainer import AppearanceTrainer
    is_grad_acc = isinstance(trainer, GradAccTrainer)
    is_appearance = isinstance(trainer, AppearanceTrainer)
    from .deform_trainer import DeformTrainer
    is_deform = isinstance(trainer, DeformTrainer)
    from .glossy_trainer import GlossyTrainer
    is_glossy = isinstance(trainer, GlossyTrainer)
    grad_buffer = trainer.init_grad_buffer(state) if is_grad_acc else None

    # SpotLessSplats: robust-mask MLP + running error histogram ride in
    # state.extra; SD features load lazily per image name
    from .spotless import (SpotLessMetricsConfig, init_spotless_state,
                           make_spotless_step, reset_shs_rest)
    is_spotless = isinstance(trainer.metrics_cfg, SpotLessMetricsConfig)
    spotless_step = None
    sd_feature_cache = {}
    if is_spotless:
        sls_cfg = trainer.metrics_cfg
        if "__spotless__" not in (state.extra or {}):
            rng, k_sls = jax.random.split(rng)
            state = state.replace(
                extra=dict(state.extra or {},
                           __spotless__=init_spotless_state(
                               k_sls, sls_cfg)))
        spotless_step = make_spotless_step(trainer, sls_cfg)
        sd_paths = (outputs.train_set.extra_data or {}).get(
            "sd_feature_paths")
        sd_by_name = (dict(zip(outputs.train_set.image_names, sd_paths))
                      if sd_paths else {})

        def load_sd_feature(name, H, W):
            if name not in sd_feature_cache:
                path = sd_by_name.get(name)
                if path and os.path.isfile(path):
                    feat = np.load(path).astype(np.float32)
                else:
                    # no features: single uniform channel (mask MLP then
                    # learns from positional encodings alone)
                    feat = np.zeros((sls_cfg.n_feature_dims, 50, 50),
                                    np.float32)
                sd_feature_cache[name] = jnp.asarray(feat)
            return sd_feature_cache[name]

    # Taming 3DGS: precompute the quadratic count-budget curve from the
    # INITIAL gaussian count (reference taming_3dgs_density_controller.py:376)
    from .taming import (Taming3DGSDensityControllerConfig,
                         compute_gaussian_scores, get_count_array,
                         taming_densify)
    is_taming = isinstance(trainer.density_cfg,
                           Taming3DGSDensityControllerConfig)
    taming_budgets = None
    if is_taming:
        d = trainer.density_cfg
        taming_budgets = get_count_array(
            int(state.gaussians.n_alive), d.budget, d.densify_until_iter,
            d.densify_from_iter, d.densification_interval, d.mode)

    def taming_density_round(state, key, step):
        """One budgeted densify round; grows capacity when the budget
        exceeds free slots (same retry discipline as vanilla)."""
        d = trainer.density_cfg
        round_i = (step - d.densify_from_iter) // d.densification_interval
        budget = taming_budgets[min(max(round_i, 0),
                                    len(taming_budgets) - 1)]
        n_cams = min(d.n_score_cameras, len(outputs.train_set))
        sel = np.linspace(0, len(outputs.train_set) - 1, n_cams).astype(int)
        cams_s, gts = [], []
        for i in sel:
            cam_i, _, img_i, _ = dataset.get(int(i))
            cams_s.append(cam_i)
            gts.append(img_i)
        grads = jnp.where(state.density.denom > 0,
                          state.density.grad_accum
                          / jnp.maximum(state.density.denom, 1.0), 0.0)
        scores = compute_gaussian_scores(
            trainer.renderer, state.gaussians, cams_s, gts, grads, bg,
            trainer.sh_degree_at(step), d.score_coeffs,
            lambda_dssim=trainer.metrics_cfg.lambda_dssim)
        use_size_prune = jnp.asarray(step > d.opacity_reset_interval)

        def one_pass(st, sc):
            gstate, opt_state, dstate, n_trunc = taming_densify(
                key, st.gaussians, st.opt_state, st.density, d, sc,
                budget, trainer.cameras_extent, trainer.prune_extent,
                use_size_prune)
            return st.replace(params=gstate.params, alive=gstate.alive,
                              opt_state=opt_state, density=dstate,
                              extra=gstate.extra), n_trunc

        new_state, n_trunc = one_pass(state, scores)
        if int(n_trunc) > 0:
            grown = trainer.grow_state(state, 2 * state.params.capacity)
            pad = jnp.zeros((grown.params.capacity - scores.shape[0],),
                            scores.dtype)
            new_state, _ = one_pass(grown, jnp.concatenate([scores, pad]))
        return new_state

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

    for step in range(start_step, cfg.max_steps + 1):
        cam, name, img, img_mask = next(loader)
        img, mask = bucketed(img, img_mask)
        H, W = img.shape[:2]
        sh_degree = trainer.sh_degree_at(step)
        jmask = None if mask is None else jnp.asarray(mask)
        if is_gns:
            d = gns_cfg
            in_phase = gns_ctl.in_reg_phase(step, gns_n_alive)
            if in_phase and (step - 1) % 100 == 0:
                ops_sorted = np.sort(np.asarray(jax.nn.sigmoid(
                    state.params.opacities[:, 0])[state.alive
                                                  ].reshape(-1)))
                gns_ctl.update_reg_weight(step, ops_sorted, gns_n_alive)
            state, scalars = gns_step(
                state, cam, jnp.asarray(img), H, W, sh_degree, bg,
                jnp.asarray(gns_ctl.reg_weight if in_phase else 0.0,
                            jnp.float32),
                jnp.asarray(step < d.opacity_reg_from
                            + d.opacity_reg_prior_free_steps),
                jnp.asarray(gns_ctl.opacity_update_factor(
                    step, gns_n_alive), jnp.float32),
                mask=jmask, isect_capacity=isect_capacity)
        elif is_spotless:
            rng, k_step = jax.random.split(rng)
            state, scalars = spotless_step(
                state, cam, jnp.asarray(img),
                load_sd_feature(name, H, W), bg, k_step, H, W, sh_degree,
                mask=jmask, isect_capacity=isect_capacity)
            if step == trainer.metrics_cfg.reset_sh:
                state = reset_shs_rest(state)
        elif is_glossy:
            state, scalars = trainer.train_step_glossy(
                state, cam, jnp.asarray(img), H, W, sh_degree, bg,
                mask=jmask, isect_capacity=isect_capacity)
        elif is_deform:
            rng, k_d = jax.random.split(rng)
            state, scalars = trainer.train_step_deform(
                state, cam, jnp.asarray(img), H, W, sh_degree, bg,
                warm_up=step < trainer.deform_cfg.warm_up, key=k_d,
                mask=jmask, isect_capacity=isect_capacity)
        elif is_appearance:
            state, scalars = trainer.train_step_appearance(
                state, cam, jnp.asarray(img), H, W, sh_degree, bg,
                warm_up=step < trainer.appearance_opt.warm_up,
                mask=jmask, isect_capacity=isect_capacity)
        elif is_grad_acc:
            k = trainer.grad_acc.accumulation_at(step)
            state, grad_buffer, scalars = trainer.train_step_accumulate(
                state, grad_buffer, cam, jnp.asarray(img), H, W, sh_degree,
                bg, apply=(step % k == 0), inv_k=1.0 / k, mask=jmask,
                isect_capacity=isect_capacity)
        else:
            state, scalars = trainer.train_step(
                state, cam, jnp.asarray(img), H, W, sh_degree, bg,
                mask=jmask, isect_capacity=isect_capacity,
                image_idx=jnp.asarray(name_to_idx.get(name, 0), jnp.int32))
        if step % 50 == 0 and int(scalars["n_dropped_isects"]) > 0:
            # 1.5x growth (512-aligned): sort/binning cost is linear in the
            # slot capacity, so over-provisioning is paid on every step
            isect_capacity = -(-int(isect_capacity * 1.5) // 512) * 512
            print(f"[fit] isect capacity -> {isect_capacity}")

        for _plugin in trainer.plugins:
            state = _plugin.after_step(state, step)

        sim_cfg = getattr(trainer, "similarity_reg", None)
        if (sim_cfg is not None and step >= sim_cfg.similarity_reg_from
                and step % sim_cfg.similarity_reg_interval == 0):
            if not hasattr(trainer, "_sim_reg_step"):
                from .similarity_reg import make_similarity_reg_step
                trainer._sim_reg_step = make_similarity_reg_step(
                    sim_cfg, trainer.tx)
            rng, k_sim = jax.random.split(rng)
            state, _sim_loss = trainer._sim_reg_step(state, k_sim)

        if training_viewer is not None \
                and step % training_viewer.pump_interval == 0:
            # fetching scalars syncs the device, so only at pump cadence
            training_viewer.pump(
                step, _tv_render_fn(state, sh_degree),
                {"loss": float(scalars["loss"]),
                 "n_gaussians": int(state.gaussians.n_alive)})

        rng, k1, k2 = jax.random.split(rng, 3)
        if is_mcmc:
            d = mcmc_cfg
            if (d.densify_from_iter < step < d.densify_until_iter
                    and step % d.densification_interval == 0):
                state, _ = _mcmc_density(state, k1)
            if step < cfg.max_steps:
                state = _mcmc_noise(state, k2,
                                    means_lr_sched(jnp.asarray(step)))
        elif is_taming:
            d = trainer.density_cfg
            if (d.densify_from_iter < step < d.densify_until_iter
                    and step % d.densification_interval == 0):
                state = taming_density_round(state, k1, step)
            if (step < d.densify_until_iter
                    and step % d.opacity_reset_interval == 0):
                state = trainer.opacity_reset_step(state)
        elif is_gns:
            d = gns_cfg
            if (d.densify_from_iter < step < d.densify_until_iter
                    and step % d.densification_interval == 0):
                state = _gns_densify(state, k1, step)
            # natural-selection phase pruning + final budget prune
            if gns_ctl.in_reg_phase(step, gns_n_alive):
                near_budget = (step != d.opacity_reg_from
                               and gns_n_alive < d.budget * 1.05)
                if near_budget or step == d.opacity_reg_until:
                    gstate, opt2 = final_budget_prune(
                        k2, state.gaussians, state.opt_state, d.budget)
                    state = state.replace(alive=gstate.alive,
                                          opt_state=opt2)
                    gns_n_alive = int(gstate.n_alive)
                    gns_ctl.final_pruned = True
                    gns_ctl.prune_step = step
                    print(f"[fit] GNS final prune at {step} -> "
                          f"{gns_n_alive}")
                elif (step % d.opacity_reg_interval == 0
                      and step >= d.opacity_reg_from + 1000):
                    gstate, opt2, n_p = prune_by_opacity(
                        state.gaussians, state.opt_state,
                        d.natural_selection_min_opacity)
                    state = state.replace(alive=gstate.alive,
                                          opt_state=opt2)
                    gns_n_alive = int(gstate.n_alive)
        elif is_static_dc:
            pass                       # static controller: no density ops
        else:
            if (bg_removal_cfg is not None
                    and bg_removal_cfg.background_removal_from < step
                    < bg_removal_cfg.densify_until_iter
                    and step % bg_removal_cfg.densification_interval == 0):
                gs2 = background_removal_step(state.gaussians, br_center,
                                              br_radius)
                state = state.replace(params=gs2.params)
            state = trainer.maybe_density_ops(state, k1, step)

        # Mip-Splatting 3D filter recompute (mip_splatting.py:50-63)
        if is_mip and step % trainer.model.filter_3d_update_interval == 0 \
                and step + trainer.model.filter_3d_update_interval \
                <= cfg.max_steps:
            f3d = compute_3d_filter(state.params.means, state.alive,
                                    train_cams)
            state = state.replace(extra={"filter_3d": f3d})

        if step % cfg.log_interval == 0:
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            n_g = int(state.gaussians.n_alive)
            logger.writerow([step, float(scalars["loss"]), n_g,
                             round(cfg.log_interval / dt, 2)])
            log_f.flush()
            if tb_writer is not None:
                tb_writer.add_scalar("train/loss", float(scalars["loss"]),
                                     step)
                tb_writer.add_scalar("train/n_gaussians", n_g, step)

        if step in cfg.lg_prune_steps:
            # LightGaussian importance pruning
            from .light_gaussian import (accumulate_blend_weights,
                                         prune_by_importance)
            n_prunes_done = sum(1 for s2 in cfg.lg_prune_steps if s2 < step)
            pct = cfg.lg_prune_percent * (cfg.lg_prune_decay
                                          ** n_prunes_done)
            sample = [outputs.train_set.cameras[i] for i in
                      np.linspace(0, len(outputs.train_set) - 1,
                                  min(cfg.lg_n_cameras,
                                      len(outputs.train_set))).astype(int)]
            gstate = state.gaussians

            def render_fn(gs, camera, bias):
                out = trainer.renderer.forward(
                    gs, camera, int(camera.height), int(camera.width), bg,
                    trainer.sh_degree_at(step),
                    rgbs_override=trainer.renderer.get_rgbs(
                        gs, camera, trainer.sh_degree_at(step))
                    + bias[:, None])
                return out.render

            imp = accumulate_blend_weights(render_fn, gstate, sample)
            gstate, opt_state2, n_pruned = prune_by_importance(
                gstate, state.opt_state, imp, pct)
            state = state.replace(alive=gstate.alive, opt_state=opt_state2)
            print(f"[fit] LightGaussian pruned {int(n_pruned)} at {step}")

        if step in cfg.save_iterations:
            save_checkpoint(os.path.join(cfg.output_dir, "checkpoints"),
                            state, step, meta=ckpt_meta())
            if cfg.save_ply:
                save_state_ply(os.path.join(
                    cfg.output_dir, "point_cloud",
                    f"iteration_{step}", "point_cloud.ply"),
                    state.gaussians)

    if cfg.max_steps not in cfg.save_iterations and start_step <= cfg.max_steps:
        save_checkpoint(os.path.join(cfg.output_dir, "checkpoints"), state,
                        cfg.max_steps, meta=ckpt_meta())
        if cfg.save_ply:
            save_state_ply(os.path.join(
                cfg.output_dir, "point_cloud",
                f"iteration_{cfg.max_steps}", "point_cloud.ply"),
                state.gaussians)
    log_f.close()

    results = None
    if val_at_end and len(outputs.val_set) > 0:
        results = validate(trainer, state, outputs, cfg)
    return state, results


def validate(trainer: Trainer, state: TrainState,
             outputs: DataParserOutputs, cfg: FitConfig,
             split: str = "val", save_images: bool = False):
    """Per-image PSNR/SSIM + CSV with MEAN row
    (reference gaussian_splatting.py:546-572)."""
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
              if lpips_fn is not None else float("nan"))
        rows.append([name, psnr, s, lp])
        if save_images:
            from PIL import Image
            side = np.concatenate([img, np.asarray(render)], axis=1)
            side = (np.clip(side, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(side).save(
                os.path.join(img_dir, name.replace("/", "_") + ".png"))

    metrics_dir = os.path.join(cfg.output_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    csv_path = os.path.join(metrics_dir, f"{split}.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["name", "psnr", "ssim", "lpips"])
        wr.writerows(rows)
        mean_psnr = float(np.mean([r[1] for r in rows]))
        mean_ssim = float(np.mean([r[2] for r in rows]))
        mean_lpips = float(np.mean([r[3] for r in rows]))
        wr.writerow(["MEAN", mean_psnr, mean_ssim, mean_lpips])
    return {"psnr": mean_psnr, "ssim": mean_ssim, "lpips": mean_lpips,
            "csv": csv_path}

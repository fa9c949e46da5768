"""Variant dispatch for the fit loop, as trainer-owned hooks.

The reference composes 20+ training variants through hook registries on
the LightningModule (/root/reference/internal/gaussian_splatting.py:113-117
`on_after_backward_hooks` / `after_density_changed_hooks`). The TPU-native
analogue: `build_hooks()` inspects the trainer's component configs ONCE and
returns three objects the fit loop calls uniformly —

- `StepHook(state, key, step, ...) -> (state, scalars)`: which jitted train
  step runs and with what host-side schedule inputs.
- `DensityHook(state, k1, k2, step) -> state`: which density-control
  schedule runs after the step (vanilla ADC / MCMC / Taming / GNS / static).
- a list of `PeriodicHook.periodic(state, key, step) -> state`: everything
  else on a step cadence (Mip 3D-filter recompute, kNN similarity reg,
  SpotLess SH reset, LightGaussian pruning).

`StepHook.init_state` runs BEFORE checkpoint resume so any variant state
riding in `TrainState.extra` (the SpotLess MLP/histogram, output-processor
params) exists in the template the checkpoint restores into.

No per-variant isinstance survives in the loop body (fit.py) — it all
lives here, evaluated once.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FitContext:
    """Loop-invariant context shared by all hooks."""
    trainer: "Trainer"
    outputs: "DataParserOutputs"
    dataset: "CachedDataset"
    cfg: "FitConfig"
    bg: jnp.ndarray
    name_to_idx: dict


# ---------------------------------------------------------------- step hooks

class StepHook:
    """Vanilla: Trainer.train_step with the per-image index (for output
    processors)."""

    def __init__(self, ctx: FitContext):
        self.ctx = ctx
        self.trainer = ctx.trainer

    def init_state(self, state, rng):
        """Inject variant state into TrainState BEFORE resume."""
        return state, rng

    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        return self.trainer.train_step(
            state, cam, img, H, W, sh_degree, self.ctx.bg,
            mask=mask, isect_capacity=isect_capacity,
            image_idx=jnp.asarray(self.ctx.name_to_idx.get(name, 0),
                                  jnp.int32))

    def periodic(self, state, key, step):
        return state


class AppearanceStepHook(StepHook):
    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        return self.trainer.train_step_appearance(
            state, cam, img, H, W, sh_degree, self.ctx.bg,
            warm_up=step < self.trainer.appearance_opt.warm_up,
            mask=mask, isect_capacity=isect_capacity)


class DeformStepHook(StepHook):
    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        return self.trainer.train_step_deform(
            state, cam, img, H, W, sh_degree, self.ctx.bg,
            warm_up=step < self.trainer.deform_cfg.warm_up, key=key,
            mask=mask, isect_capacity=isect_capacity)


class GlossyStepHook(StepHook):
    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        return self.trainer.train_step_glossy(
            state, cam, img, H, W, sh_degree, self.ctx.bg,
            mask=mask, isect_capacity=isect_capacity)


class GradAccStepHook(StepHook):
    """Gradient accumulation: the host-side buffer rides on the hook; it is
    re-zeroed if capacity grew since it was allocated (density ops resize
    the parameter arrays under it)."""

    def __init__(self, ctx):
        super().__init__(ctx)
        self.grad_buffer = None

    def init_state(self, state, rng):
        self.grad_buffer = self.trainer.init_grad_buffer(state)
        return state, rng

    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        if (self.grad_buffer is None
                or jax.tree.leaves(self.grad_buffer)[0].shape[0]
                != state.params.capacity):
            self.grad_buffer = self.trainer.init_grad_buffer(state)
        k = self.trainer.grad_acc.accumulation_at(step)
        state, self.grad_buffer, scalars = \
            self.trainer.train_step_accumulate(
                state, self.grad_buffer, cam, img, H, W, sh_degree,
                self.ctx.bg, apply=(step % k == 0), inv_k=1.0 / k,
                mask=mask, isect_capacity=isect_capacity)
        return state, scalars


class SpotLessStepHook(StepHook):
    """SpotLessSplats: robust-mask MLP + error histogram live in
    state.extra['__spotless__']; SD features load lazily per image name."""

    def __init__(self, ctx):
        super().__init__(ctx)
        from .spotless import make_spotless_step
        self.cfg = ctx.trainer.metrics_cfg
        self.step_fn = make_spotless_step(ctx.trainer, self.cfg)
        sd_paths = (ctx.outputs.train_set.extra_data or {}).get(
            "sd_feature_paths")
        self.sd_by_name = (dict(zip(ctx.outputs.train_set.image_names,
                                    sd_paths)) if sd_paths else {})
        self.sd_cache = {}

    def init_state(self, state, rng):
        # injected BEFORE resume so the orbax tree template matches a saved
        # spotless checkpoint (round-2 advisor finding: post-resume init
        # made spotless runs unresumable)
        from .spotless import init_spotless_state
        if "__spotless__" not in (state.extra or {}):
            rng, k = jax.random.split(rng)
            state = state.replace(
                extra=dict(state.extra or {},
                           __spotless__=init_spotless_state(k, self.cfg)))
        return state, rng

    def _load_sd_feature(self, name):
        import os
        if name not in self.sd_cache:
            path = self.sd_by_name.get(name)
            if path and os.path.isfile(path):
                feat = np.load(path).astype(np.float32)
            else:
                # no features: zero channels (mask MLP then learns from
                # positional encodings alone)
                feat = np.zeros((self.cfg.n_feature_dims, 50, 50),
                                np.float32)
            self.sd_cache[name] = jnp.asarray(feat)
        return self.sd_cache[name]

    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        return self.step_fn(
            state, cam, img, self._load_sd_feature(name), self.ctx.bg, key,
            H, W, sh_degree, mask=mask, isect_capacity=isect_capacity)

    def periodic(self, state, key, step):
        from .spotless import reset_shs_rest
        if step == self.cfg.reset_sh:
            state = reset_shs_rest(state)
        return state


# ------------------------------------------------------------- density hooks

class DensityHook:
    """Vanilla ADC schedule via Trainer.maybe_density_ops, optionally with a
    background-removal pre-step (reference
    background_removal_density_controller)."""

    def __init__(self, ctx: FitContext):
        self.ctx = ctx
        self.trainer = ctx.trainer
        from .density import BackgroundRemovalDensityControllerConfig
        d = ctx.trainer.density_cfg
        self.bg_removal = d if isinstance(
            d, BackgroundRemovalDensityControllerConfig) else None
        if self.bg_removal is not None:
            centers = np.stack([
                np.asarray(ctx.outputs.train_set.cameras[i].camera_center)
                for i in range(len(ctx.outputs.train_set))])
            self.br_center = centers.mean(0)
            self.br_radius = (
                np.linalg.norm(centers - self.br_center, axis=-1).max()
                * self.bg_removal.foreground_radius_scaling)

    def __call__(self, state, k1, k2, step):
        if self.bg_removal is not None:
            d = self.bg_removal
            if (d.background_removal_from < step < d.densify_until_iter
                    and step % d.densification_interval == 0):
                from .density import background_removal_step
                gs2 = background_removal_step(state.gaussians,
                                              self.br_center, self.br_radius)
                state = state.replace(params=gs2.params)
        return self.trainer.maybe_density_ops(state, k1, step)


class StaticDensityHook(DensityHook):
    def __init__(self, ctx):
        self.ctx = ctx

    def __call__(self, state, k1, k2, step):
        return state


class MCMCDensityHook(DensityHook):
    def __init__(self, ctx: FitContext):
        self.ctx = ctx
        self.trainer = ctx.trainer
        from .mcmc import mcmc_densify, mcmc_noise_step
        d = ctx.trainer.density_cfg
        self.d = d
        opt = ctx.trainer.model.optimization
        from .schedulers import exponential_decay
        self.means_lr = exponential_decay(
            lr_init=opt.means_lr_init * ctx.trainer.cameras_extent,
            lr_final=opt.means_lr_init * opt.means_lr_final_factor
            * ctx.trainer.cameras_extent,
            max_steps=opt.means_lr_max_steps)

        @jax.jit
        def _density(state, key):
            gstate, opt_state, n_new = mcmc_densify(
                key, state.gaussians, state.opt_state, d)
            return state.replace(params=gstate.params, alive=gstate.alive,
                                 opt_state=opt_state,
                                 extra=gstate.extra), n_new

        @jax.jit
        def _noise(state, key, lr):
            gstate = mcmc_noise_step(key, state.gaussians, lr, d.noise_lr)
            return state.replace(params=gstate.params)

        self._density, self._noise = _density, _noise

    def __call__(self, state, k1, k2, step):
        d = self.d
        if (d.densify_from_iter < step < d.densify_until_iter
                and step % d.densification_interval == 0):
            state, _ = self._density(state, k1)
        if step < self.ctx.cfg.max_steps:
            state = self._noise(state, k2, self.means_lr(jnp.asarray(step)))
        return state


class TamingDensityHook(DensityHook):
    """Taming 3DGS budgeted densification: the quadratic count curve is
    precomputed from the INITIAL count (reference
    taming_3dgs_density_controller.py:376)."""

    def __init__(self, ctx: FitContext, initial_n_alive: int):
        self.ctx = ctx
        self.trainer = ctx.trainer
        from .taming import get_count_array
        d = ctx.trainer.density_cfg
        self.d = d
        self.budgets = get_count_array(
            initial_n_alive, d.budget, d.densify_until_iter,
            d.densify_from_iter, d.densification_interval, d.mode)

    def _density_round(self, state, key, step):
        """One budgeted round; grows capacity (and redoes the pass) until
        nothing is truncated."""
        from .taming import compute_gaussian_scores, taming_densify
        d = self.d
        ctx = self.ctx
        round_i = (step - d.densify_from_iter) // d.densification_interval
        budget = self.budgets[min(max(round_i, 0), len(self.budgets) - 1)]
        n_cams = min(d.n_score_cameras, len(ctx.outputs.train_set))
        sel = np.linspace(0, len(ctx.outputs.train_set) - 1,
                          n_cams).astype(int)
        cams_s, gts = [], []
        for i in sel:
            cam_i, _, img_i, _ = ctx.dataset.get(int(i))
            cams_s.append(cam_i)
            gts.append(img_i)
        grads = jnp.where(state.density.denom > 0,
                          state.density.grad_accum
                          / jnp.maximum(state.density.denom, 1.0), 0.0)
        scores = compute_gaussian_scores(
            self.trainer.renderer, state.gaussians, cams_s, gts, grads,
            ctx.bg, self.trainer.sh_degree_at(step), d.score_coeffs,
            lambda_dssim=self.trainer.metrics_cfg.lambda_dssim)
        use_size_prune = jnp.asarray(step > d.opacity_reset_interval)

        def one_pass(st, sc):
            gstate, opt_state, dstate, n_trunc = taming_densify(
                key, st.gaussians, st.opt_state, st.density, d, sc,
                budget, self.trainer.cameras_extent,
                self.trainer.prune_extent, use_size_prune)
            return st.replace(params=gstate.params, alive=gstate.alive,
                              opt_state=opt_state, density=dstate,
                              extra=gstate.extra), n_trunc

        new_state, n_trunc = one_pass(state, scores)
        tries = 0
        while int(n_trunc) > 0 and tries < 3:
            state = self.trainer.grow_state(state,
                                            2 * state.params.capacity)
            pad = jnp.zeros((state.params.capacity - scores.shape[0],),
                            scores.dtype)
            scores = jnp.concatenate([scores, pad])
            new_state, n_trunc = one_pass(state, scores)
            tries += 1
        if int(n_trunc) > 0:
            print(f"[fit] taming densify still truncating {int(n_trunc)} "
                  f"after {tries} growths")
        return new_state

    def __call__(self, state, k1, k2, step):
        d = self.d
        if (d.densify_from_iter < step < d.densify_until_iter
                and step % d.densification_interval == 0):
            state = self._density_round(state, k1, step)
        if (step < d.densify_until_iter
                and step % d.opacity_reset_interval == 0):
            state = self.trainer.opacity_reset_step(state)
        return state


class GNSHooks(StepHook):
    """Gaussian Natural Selection: couples the train step (opacity
    regularization schedule) with its density controller, sharing the live
    gaussian count — so one object provides BOTH the step and density hooks
    (reference gns_density_controller.py)."""

    def __init__(self, ctx: FitContext, initial_n_alive: int):
        super().__init__(ctx)
        from .gns import GNSController, make_gns_step
        self.d = ctx.trainer.density_cfg
        self.ctl = GNSController(self.d)
        self.step_fn = make_gns_step(ctx.trainer, self.d)
        self.n_alive = initial_n_alive

    def __call__(self, state, key, step, sh_degree, cam, name, img, mask,
                 H, W, isect_capacity):
        d = self.d
        in_phase = self.ctl.in_reg_phase(step, self.n_alive)
        if in_phase and (step - 1) % 100 == 0:
            ops_sorted = np.sort(np.asarray(jax.nn.sigmoid(
                state.params.opacities[:, 0])[state.alive].reshape(-1)))
            self.ctl.update_reg_weight(step, ops_sorted, self.n_alive)
        return self.step_fn(
            state, cam, img, H, W, sh_degree, self.ctx.bg,
            jnp.asarray(self.ctl.reg_weight if in_phase else 0.0,
                        jnp.float32),
            jnp.asarray(step < d.opacity_reg_from
                        + d.opacity_reg_prior_free_steps),
            jnp.asarray(self.ctl.opacity_update_factor(step, self.n_alive),
                        jnp.float32),
            mask=mask, isect_capacity=isect_capacity)

    def _densify(self, state, key, step):
        from .gns import (edge_weighted_blend_scores, gns_budget_at,
                          gns_densify)
        from .taming import get_edges
        d = self.d
        ctx = self.ctx
        if d.edge_aware:
            n_cams = min(d.n_sample_cameras, len(ctx.outputs.train_set))
            sel = np.random.RandomState(step).permutation(
                len(ctx.outputs.train_set))[:n_cams]
            cams_s, edges = [], []
            for i in sel:
                cam_i, _, img_i, _ = ctx.dataset.get(int(i))
                cams_s.append(cam_i)
                edges.append(get_edges(jnp.asarray(img_i)))
            importance = edge_weighted_blend_scores(
                self.trainer.renderer, state.gaussians, cams_s, edges,
                ctx.bg, self.trainer.sh_degree_at(step))
        else:
            importance = jnp.where(
                state.density.denom > 0,
                state.density.grad_accum
                / jnp.maximum(state.density.denom, 1.0), 0.0)
        budget = jnp.asarray(gns_budget_at(d, step), jnp.int32)
        gstate, opt_state, dstate, n_trunc = gns_densify(
            key, state.gaussians, state.opt_state, state.density, d,
            importance, budget)
        tries = 0
        while int(n_trunc) > 0 and tries < 3:
            state = self.trainer.grow_state(state,
                                            2 * state.params.capacity)
            pad = jnp.zeros((state.params.capacity
                             - importance.shape[0],), jnp.float32)
            importance = jnp.concatenate([importance, pad])
            gstate, opt_state, dstate, n_trunc = gns_densify(
                key, state.gaussians, state.opt_state, state.density, d,
                importance, budget)
            tries += 1
        if int(n_trunc) > 0:
            print(f"[fit] GNS densify still truncating {int(n_trunc)} "
                  f"after {tries} growths")
        state = state.replace(params=gstate.params, alive=gstate.alive,
                              opt_state=opt_state, density=dstate,
                              extra=gstate.extra)
        self.n_alive = int(gstate.n_alive)
        return state

    def density(self, state, k1, k2, step):
        from .gns import final_budget_prune, prune_by_opacity
        d = self.d
        if (d.densify_from_iter < step < d.densify_until_iter
                and step % d.densification_interval == 0):
            state = self._densify(state, k1, step)
        # natural-selection phase pruning + final budget prune
        if self.ctl.in_reg_phase(step, self.n_alive):
            near_budget = (step != d.opacity_reg_from
                           and self.n_alive < d.budget * 1.05)
            if near_budget or step == d.opacity_reg_until:
                gstate, opt2 = final_budget_prune(
                    k2, state.gaussians, state.opt_state, d.budget)
                state = state.replace(alive=gstate.alive, opt_state=opt2)
                self.n_alive = int(gstate.n_alive)
                self.ctl.final_pruned = True
                self.ctl.prune_step = step
                print(f"[fit] GNS final prune at {step} -> {self.n_alive}")
            elif (step % d.opacity_reg_interval == 0
                  and step >= d.opacity_reg_from + 1000):
                gstate, opt2, n_p = prune_by_opacity(
                    state.gaussians, state.opt_state,
                    d.natural_selection_min_opacity)
                state = state.replace(alive=gstate.alive, opt_state=opt2)
                self.n_alive = int(gstate.n_alive)
        return state


class _GNSDensityAdapter(DensityHook):
    def __init__(self, gns_hooks: GNSHooks):
        self.gns = gns_hooks

    def __call__(self, state, k1, k2, step):
        return self.gns.density(state, k1, k2, step)


# ------------------------------------------------------------ periodic hooks

class MipFilterHook:
    """Mip-Splatting 3D filter recompute (reference
    internal/models/mip_splatting.py:50-63)."""

    def __init__(self, ctx: FitContext):
        self.ctx = ctx
        self.train_cams = ctx.outputs.train_set.cameras
        self.interval = ctx.trainer.model.filter_3d_update_interval

    def periodic(self, state, key, step):
        if (step % self.interval == 0
                and step + self.interval <= self.ctx.cfg.max_steps):
            from ..models.mip_splatting import compute_3d_filter
            f3d = compute_3d_filter(state.params.means, state.alive,
                                    self.train_cams)
            state = state.replace(extra={"filter_3d": f3d})
        return state


class SimilarityRegHook:
    """kNN appearance-feature similarity regularization on its interval
    (reference appearance_feature_similarity_regularization_metrics.py)."""

    def __init__(self, ctx: FitContext):
        self.ctx = ctx
        self.sim_cfg = ctx.trainer.similarity_reg
        self._step = None

    def periodic(self, state, key, step):
        c = self.sim_cfg
        if step >= c.similarity_reg_from \
                and step % c.similarity_reg_interval == 0:
            if self._step is None:
                from .similarity_reg import make_similarity_reg_step
                self._step = make_similarity_reg_step(c, self.ctx.trainer.tx)
            state, _ = self._step(state, key)
        return state


class LightGaussianPruneHook:
    """LightGaussian importance pruning at fixed steps (reference
    gaussian_splatting.py:399-444)."""

    def __init__(self, ctx: FitContext):
        self.ctx = ctx

    def periodic(self, state, key, step):
        cfg, ctx = self.ctx.cfg, self.ctx
        if step not in cfg.lg_prune_steps:
            return state
        from .light_gaussian import (accumulate_blend_weights,
                                     prune_by_importance)
        trainer = ctx.trainer
        n_done = sum(1 for s2 in cfg.lg_prune_steps if s2 < step)
        pct = cfg.lg_prune_percent * (cfg.lg_prune_decay ** n_done)
        sample = [ctx.outputs.train_set.cameras[i] for i in
                  np.linspace(0, len(ctx.outputs.train_set) - 1,
                              min(cfg.lg_n_cameras,
                                  len(ctx.outputs.train_set))).astype(int)]
        gstate = state.gaussians

        def render_fn(gs, camera, bias):
            out = trainer.renderer.forward(
                gs, camera, int(camera.height), int(camera.width), ctx.bg,
                trainer.sh_degree_at(step),
                rgbs_override=trainer.renderer.get_rgbs(
                    gs, camera, trainer.sh_degree_at(step)) + bias[:, None])
            return out.render

        imp = accumulate_blend_weights(render_fn, gstate, sample)
        gstate, opt_state2, n_pruned = prune_by_importance(
            gstate, state.opt_state, imp, pct)
        state = state.replace(alive=gstate.alive, opt_state=opt_state2)
        print(f"[fit] LightGaussian pruned {int(n_pruned)} at {step}")
        return state


# ------------------------------------------------------------------ dispatch

def build_hooks(ctx: FitContext, initial_n_alive: int):
    """Resolve the trainer's component configs into (step_hook,
    density_hook, pre_density_hooks, post_density_hooks). The only
    isinstance dispatch in the fit path lives here, evaluated once."""
    from ..models.mip_splatting import MipSplattingConfig
    from .appearance_trainer import AppearanceTrainer
    from .deform_trainer import DeformTrainer
    from .density import StaticDensityControllerConfig
    from .glossy_trainer import GlossyTrainer
    from .gns import GNSDensityControllerConfig
    from .mcmc import MCMCDensityControllerConfig
    from .opt_strategies import GradAccTrainer
    from .spotless import SpotLessMetricsConfig
    from .taming import Taming3DGSDensityControllerConfig

    trainer = ctx.trainer
    gns = None
    if isinstance(trainer.density_cfg, GNSDensityControllerConfig):
        gns = GNSHooks(ctx, initial_n_alive)

    # step hook: GNS overrides the step too (opacity-reg schedule); the
    # trainer subclasses each own one; SpotLess keys off the metrics config
    if gns is not None:
        step_hook = gns
    elif isinstance(trainer.metrics_cfg, SpotLessMetricsConfig):
        step_hook = SpotLessStepHook(ctx)
    elif isinstance(trainer, GlossyTrainer):
        step_hook = GlossyStepHook(ctx)
    elif isinstance(trainer, DeformTrainer):
        step_hook = DeformStepHook(ctx)
    elif isinstance(trainer, AppearanceTrainer):
        step_hook = AppearanceStepHook(ctx)
    elif isinstance(trainer, GradAccTrainer):
        step_hook = GradAccStepHook(ctx)
    else:
        step_hook = StepHook(ctx)

    if gns is not None:
        density_hook = _GNSDensityAdapter(gns)
    elif isinstance(trainer.density_cfg, MCMCDensityControllerConfig):
        density_hook = MCMCDensityHook(ctx)
    elif isinstance(trainer.density_cfg, Taming3DGSDensityControllerConfig):
        density_hook = TamingDensityHook(ctx, initial_n_alive)
    elif isinstance(trainer.density_cfg, StaticDensityControllerConfig):
        density_hook = StaticDensityHook(ctx)
    else:
        density_hook = DensityHook(ctx)

    pre_density = [step_hook]
    if getattr(trainer, "similarity_reg", None) is not None:
        pre_density.append(SimilarityRegHook(ctx))
    post_density = []
    if isinstance(trainer.model, MipSplattingConfig):
        post_density.append(MipFilterHook(ctx))
    if ctx.cfg.lg_prune_steps:
        post_density.append(LightGaussianPruneHook(ctx))
    return step_hook, density_hook, pre_density, post_density

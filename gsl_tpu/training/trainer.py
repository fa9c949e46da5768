"""Training orchestrator: the TPU-native analogue of the reference
`GaussianSplatting` LightningModule training loop
(/root/reference/internal/gaussian_splatting.py:329-470), re-shaped as
jitted pure functions over an explicit TrainState:

- `train_step`: forward (render) -> L1+SSIM loss -> grads (including the
  means2d tap for densification stats) -> per-property Adam updates.
- `density_step`: clone/split/prune + opacity reset at the reference
  schedule, as a second jitted function (shape-static capacity).
- the Python loop around them handles data feeding, capacity growth
  (recompile boundary), logging, and checkpointing.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Cameras
from ..models.gaussian import (GaussianParams, GaussianState,
                               VanillaGaussianConfig, active_sh_degree,
                               grow_capacity)
from ..renderers.tile_renderer import (TileRenderer, TileRendererConfig,
                                       viewspace_grad_scale)
from .density import (DensityControlState, VanillaDensityControllerConfig,
                      densify_and_prune, init_density_state, reset_opacities,
                      update_stats)
from .metrics import VanillaMetricsConfig, train_loss, psnr
from .optimizers import build_gaussian_optimizer, grow_opt_state


@flax.struct.dataclass
class TrainState:
    params: GaussianParams
    alive: jnp.ndarray
    opt_state: Any
    density: DensityControlState
    step: jnp.ndarray  # int32
    extra: Any = None  # non-trainable per-Gaussian properties

    @property
    def gaussians(self) -> GaussianState:
        return GaussianState(params=self.params, alive=self.alive,
                             extra=self.extra)


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 30_000
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    sh_degree_interval: int = 1000


class Trainer:
    """Composes model/renderer/density/metrics configs (the reference's
    component seams) into jitted step functions."""

    def __init__(
        self,
        model: VanillaGaussianConfig = None,
        renderer: TileRendererConfig = None,
        density: VanillaDensityControllerConfig = None,
        metrics: VanillaMetricsConfig = None,
        config: TrainerConfig = None,
        output_processor=None,
        plugins: tuple = (),
    ):
        self.plugins = tuple(plugins)
        self.model = model or VanillaGaussianConfig()
        self.renderer_cfg = renderer or TileRendererConfig()
        self.renderer = self.renderer_cfg.instantiate()
        self.density_cfg = density or VanillaDensityControllerConfig()
        self.metrics_cfg = metrics or VanillaMetricsConfig()
        self.config = config or TrainerConfig()
        self.output_processor = output_processor
        self.op_tx = None
        self.cameras_extent: float = 1.0
        self.prune_extent: float = 1.0
        self.tx = None

    # ---- output processors (bilagrid / exposure) ----
    def init_output_processor(self, state: TrainState,
                              n_images: int) -> TrainState:
        """Create per-image processor params + their own Adam, stored in
        TrainState.extra so they checkpoint/resume with the run (reference
        output processors own optimizers, gaussian_splatting.py:625-681)."""
        import optax

        from .output_processors import (BilateralGridConfig,
                                        init_bilateral_grids,
                                        init_exposures)
        cfg = dataclasses.replace(self.output_processor, n_images=n_images)
        self.output_processor = cfg
        if isinstance(cfg, BilateralGridConfig):
            params = init_bilateral_grids(cfg)
        else:
            params = init_exposures(cfg)
        self.op_tx = optax.adam(cfg.lr)
        extra = dict(state.extra or {})
        extra["__outproc__"] = params
        extra["__outproc_opt__"] = self.op_tx.init(params)
        return state.replace(extra=extra)

    def _apply_output_processor(self, op_params, image_idx, render):
        """render [H, W, 3] -> (processed, regularizer)."""
        from .output_processors import (BilateralGridConfig,
                                        apply_exposure,
                                        bilateral_grid_tv_loss,
                                        slice_bilateral_grid)
        if isinstance(self.output_processor, BilateralGridConfig):
            g = op_params[image_idx]
            out = slice_bilateral_grid(g, render)
            reg = self.output_processor.tv_weight \
                * bilateral_grid_tv_loss(g[None])
            return out, reg
        return apply_exposure(op_params[image_idx], render), 0.0

    # ---- setup ----
    def setup(self, gaussians: GaussianState, cameras_extent: float,
              prune_extent: Optional[float] = None) -> TrainState:
        self.cameras_extent = float(cameras_extent) * \
            self.density_cfg.camera_extent_factor
        self.prune_extent = float(
            prune_extent if prune_extent is not None else cameras_extent
        ) * self.density_cfg.camera_extent_factor
        if self.density_cfg.scene_extent_override > 0:
            self.cameras_extent = self.density_cfg.scene_extent_override
            self.prune_extent = self.density_cfg.scene_extent_override
        self.tx = build_gaussian_optimizer(
            self.model.optimization, spatial_lr_scale=self.cameras_extent,
            has_appearance_features=(
                gaussians.params.appearance_features is not None),
            has_pvg=(gaussians.params.t_centers is not None))
        opt_state = self.tx.init(gaussians.params)
        state = TrainState(
            params=gaussians.params,
            alive=gaussians.alive,
            opt_state=opt_state,
            density=init_density_state(gaussians.capacity),
            step=jnp.zeros((), jnp.int32),
            extra=gaussians.extra,
        )
        for plugin in self.plugins:
            state = plugin.on_setup(state)
        return state

    # ---- loss computation (override point for variant trainers) ----
    def render_losses(self, gstate, camera, img_height, img_width, bg_color,
                      sh_degree, gt_image, mask, tap, abstap, step,
                      aux_inputs=None, isect_capacity=None,
                      op_params=None, image_idx=None):
        render_types = frozenset({"rgb"}).union(
            *[p.required_render_types for p in self.plugins]) \
            if self.plugins else frozenset({"rgb"})
        out = self.renderer.forward(
            gstate, camera, img_height, img_width, bg_color, sh_degree,
            means2d_tap=tap, absgrad_tap=abstap,
            isect_capacity=isect_capacity, render_types=render_types)
        render = out.render
        op_reg = 0.0
        if op_params is not None:
            render, op_reg = self._apply_output_processor(
                op_params, image_idx, render)
        loss, scalars = train_loss(
            render, gt_image, mask,
            lambda_dssim=self.metrics_cfg.lambda_dssim,
            rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)
        loss = loss + op_reg
        # MCMC opacity/scale L1 regularizers (mcmc_metrics.py:28-66)
        m = self.metrics_cfg
        params = gstate.params
        if m.opacity_reg > 0.0 or m.scale_reg > 0.0:
            n_alive = jnp.maximum(
                jnp.sum(gstate.alive.astype(jnp.float32)), 1.0)
            if m.opacity_reg > 0.0:
                loss = loss + m.opacity_reg * jnp.sum(
                    jax.nn.sigmoid(params.opacities[:, 0])
                    * gstate.alive) / n_alive
            if m.scale_reg > 0.0:
                loss = loss + m.scale_reg * jnp.sum(
                    jnp.exp(params.scales)
                    * gstate.alive[:, None]) / (3.0 * n_alive)
        for plugin in self.plugins:
            term, sc = plugin.extra_loss(out, gt_image, mask, gstate, step,
                                         camera=camera)
            loss = loss + term
            scalars = dict(scalars, **sc)
        return loss, (scalars, out.radii, out.n_dropped)

    # ---- jitted step functions ----
    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "isect_capacity"))
    def train_step(self, state: TrainState, camera: Cameras,
                   gt_image: jnp.ndarray, img_height: int, img_width: int,
                   sh_degree: int, bg_color: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None,
                   aux_inputs=None, isect_capacity: Optional[int] = None,
                   image_idx: Optional[jnp.ndarray] = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        # the absgrad tap is produced only by the Pallas backward; on the
        # XLA backend its gradient is identically zero, which would silently
        # disable densification — fall back to the regular means2d tap there
        # (an approximation: |sum| instead of sum|.|, per-tile)
        use_absgrad = (self.density_cfg is not None
                       and getattr(self.density_cfg, "absgrad", False)
                       and self.renderer.uses_pallas())
        has_op = (self.output_processor is not None
                  and isinstance(state.extra, dict)
                  and "__outproc__" in state.extra)
        op_params0 = state.extra["__outproc__"] if has_op else None

        def loss_fn(params, tap, abstap, op_params):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=state.extra)
            return self.render_losses(
                gstate, camera, img_height, img_width, bg_color, sh_degree,
                gt_image, mask, tap, abstap, state.step,
                aux_inputs=aux_inputs, isect_capacity=isect_capacity,
                op_params=op_params, image_idx=image_idx)

        # absgrad (AbsGS) stats come from the Pallas backward's abs tap;
        # only differentiate wrt it when configured (it is zero otherwise)
        argnums = (0, 1, 2) if use_absgrad else (0, 1)
        if has_op:
            argnums = argnums + (3,)
        (loss, (scalars, radii, n_dropped)), grads = (
            jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)(
                state.params, tap0, jnp.zeros_like(tap0), op_params0))
        pgrads, tap_grad = grads[0], grads[1]
        stat_grad = grads[2] if use_absgrad else tap_grad

        gscale = viewspace_grad_scale(
            img_width, img_height,
            self.renderer_cfg.max_viewspace_grad_scale)
        from .density import AccurateVisibilityFilterDensityControllerConfig
        acc_vis = isinstance(self.density_cfg,
                             AccurateVisibilityFilterDensityControllerConfig)
        density = update_stats(state.density, stat_grad, radii, gscale,
                               accurate_visibility=acc_vis)

        updates, opt_state = self.tx.update(
            pgrads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        extra = state.extra
        if has_op:
            # the processor's own optimizer steps inside the train step
            # (reference output_processors own their optimizers)
            op_grads = grads[-1]
            op_updates, op_opt = self.op_tx.update(
                op_grads, state.extra["__outproc_opt__"], op_params0)
            extra = dict(state.extra,
                         __outproc__=jax.tree.map(
                             lambda p, u: p + u, op_params0, op_updates),
                         __outproc_opt__=op_opt)

        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        scalars = dict(scalars, n_dropped_isects=n_dropped)
        return new_state, scalars

    @functools.partial(jax.jit, static_argnames=("self",))
    def density_step(self, state: TrainState, key: jax.Array,
                     use_size_prune: jnp.ndarray):
        gstate, opt_state, density, n_trunc = densify_and_prune(
            key, state.gaussians, state.opt_state, state.density,
            self.density_cfg, self.cameras_extent, self.prune_extent,
            use_size_prune)
        return TrainState(
            params=gstate.params, alive=gstate.alive, opt_state=opt_state,
            density=density, step=state.step, extra=gstate.extra), n_trunc

    @functools.partial(jax.jit, static_argnames=("self",))
    def opacity_reset_step(self, state: TrainState):
        gstate, opt_state = reset_opacities(
            state.gaussians, state.opt_state,
            self.density_cfg.opacity_reset_value)
        return state.replace(params=gstate.params, opt_state=opt_state)

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree"))
    def eval_step(self, state: TrainState, camera: Cameras,
                  gt_image: jnp.ndarray, img_height: int, img_width: int,
                  sh_degree: int, bg_color: jnp.ndarray):
        out = self.renderer.forward(
            state.gaussians, camera, img_height, img_width, bg_color,
            sh_degree)
        return out.render, {"psnr": psnr(out.render, gt_image)}

    # ---- capacity growth (host-side recompile boundary) ----
    def grow_state(self, state: TrainState, new_capacity: int) -> TrainState:
        """Grow capacity 2x, CARRYING Adam moments, schedule counts and
        density stats for existing rows (the reference zero-pads only the
        new rows, density_controller.py:47-103; re-initializing would reset
        training dynamics at every growth event)."""
        old_cap = state.params.capacity
        gstate = grow_capacity(state.gaussians, new_capacity)
        opt_state = grow_opt_state(
            state.opt_state, self.tx.init(gstate.params), old_cap)

        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((new_capacity - old_cap,) + x.shape[1:],
                              x.dtype)], axis=0)

        density = jax.tree.map(pad, state.density)
        return TrainState(
            params=gstate.params, alive=gstate.alive, opt_state=opt_state,
            density=density, step=state.step, extra=gstate.extra)

    # ---- python-side schedule (reference after_backward schedule) ----
    def maybe_density_ops(self, state: TrainState, key: jax.Array,
                          step: int) -> TrainState:
        """Run densify/prune + opacity reset at the reference schedule.
        `step` is the 1-based global step (reference gaussian_splatting.py:333
        'must start from 1')."""
        cfg = self.density_cfg
        if step < cfg.densify_until_iter:
            if (step > cfg.densify_from_iter
                    and step % cfg.densification_interval == 0):
                use_size_prune = jnp.asarray(
                    step > cfg.opacity_reset_interval)
                prev = state
                state, n_trunc = self.density_step(state, key,
                                                   use_size_prune)
                tries = 0
                while int(n_trunc) > 0 and tries < 3:
                    # capacity exhausted: grow 2x from the PRE-densify
                    # snapshot and redo the pass so the truncated children
                    # of this round are not silently dropped
                    prev = self.grow_state(prev, 2 * prev.params.capacity)
                    state, n_trunc = self.density_step(prev, key,
                                                       use_size_prune)
                    tries += 1
                if int(n_trunc) > 0:  # pathological single round
                    print(f"[trainer] densify at step {step} still "
                          f"truncating {int(n_trunc)} after {tries} "
                          f"capacity growths")
            white_bg = all(c == 1.0 for c in self.config.background_color)
            if (step % cfg.opacity_reset_interval == 0
                    or (white_bg and step == cfg.densify_from_iter)):
                state = self.opacity_reset_step(state)
        return state

    def sh_degree_at(self, step: int) -> int:
        return min(step // self.config.sh_degree_interval,
                   self.model.sh_degree)

"""Appearance-embedding training: Trainer variant carrying the
embedding+MLP network state alongside the Gaussians.

Semantics parity (gsplat_appearance_embedding_renderer.py:253-300):
- warm-up (first 4000 steps): plain SH colors, network untouched,
- after: rgb = clamp(SH + 0.5 + (net(feat, emb, dir)*2 - 1), 0, 1),
- optional opacity head: opacity = clamp(op + offset, max=1) with
  0.05 * mean(offset) regularization.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.cameras import Cameras
from ..models.appearance import (AppearanceNetwork, network_lr_schedule)
from ..models.gaussian import GaussianState
from ..ops.sh import sh_to_rgb
from .metrics import train_loss
from .trainer import Trainer, TrainState


@dataclasses.dataclass
class AppearanceOptimizationConfig:
    embedding_lr_init: float = 2e-3
    lr_init: float = 1e-3
    lr_final_factor: float = 0.1
    eps: float = 1e-15
    max_steps: int = 30_000
    warm_up: int = 4000


@flax.struct.dataclass
class AppearanceNetState:
    params: Any
    opt_state: Any


class AppearanceTrainer(Trainer):
    """Trainer with a per-image appearance network. The network state rides
    in TrainState.extra["__net__"]."""

    def __init__(self, *args, n_appearances: int = 1024,
                 with_opacity: bool = False, is_view_dependent: bool = False,
                 appearance_opt: AppearanceOptimizationConfig = None,
                 similarity_reg=None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.similarity_reg = similarity_reg
        self.appearance_opt = appearance_opt or AppearanceOptimizationConfig()
        self.net = AppearanceNetwork(
            n_appearances=n_appearances, with_opacity=with_opacity,
            is_view_dependent=is_view_dependent)
        self.with_opacity = with_opacity
        o = self.appearance_opt
        # separate Adams: embedding vs network, both exp-decayed past warm-up
        self.net_tx = optax.multi_transform(
            {
                "embedding": optax.adam(network_lr_schedule(
                    o.embedding_lr_init, o.lr_final_factor, o.max_steps,
                    o.warm_up), eps=o.eps),
                "network": optax.adam(network_lr_schedule(
                    o.lr_init, o.lr_final_factor, o.max_steps, o.warm_up),
                    eps=o.eps),
            },
            lambda params: jax.tree.map_with_path(
                lambda path, _: "embedding" if any(
                    getattr(p, "key", None) == "Embed_0" for p in path)
                else "network", params),
        )

    def setup(self, gaussians: GaussianState, cameras_extent: float,
              prune_extent: Optional[float] = None) -> TrainState:
        state = super().setup(gaussians, cameras_extent, prune_extent)
        key = jax.random.PRNGKey(0)
        feat_dim = gaussians.params.appearance_features.shape[-1]
        net_params = self.net.init(
            key, jnp.zeros((4, feat_dim)), jnp.zeros((), jnp.int32),
            jnp.zeros((4, 3)))
        net_opt = self.net_tx.init(net_params)
        extra = dict(state.extra or {})
        extra["__net__"] = AppearanceNetState(params=net_params,
                                              opt_state=net_opt)
        return state.replace(extra=extra)

    def _rgbs(self, gstate: GaussianState, camera: Cameras, sh_degree: int,
              net_params, warm_up: bool):
        viewdirs = jax.lax.stop_gradient(
            gstate.get_means()) - camera.camera_center
        viewdirs = viewdirs / jnp.maximum(
            jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
        base = jnp.clip(
            sh_to_rgb(gstate.get_shs(), viewdirs, sh_degree,
                      normalize_dirs=False) + 0.5, 0.0, None)
        if warm_up:
            return base, None
        pred = self.net.apply(net_params,
                              gstate.params.appearance_features,
                              camera.appearance_id, viewdirs)
        rgbs = jnp.clip(base + (pred[:, :3] * 2.0 - 1.0), 0.0, 1.0)
        op_offset = pred[:, 3] if self.with_opacity else None
        return rgbs, op_offset

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "warm_up",
        "isect_capacity"))
    def train_step_appearance(self, state: TrainState, camera: Cameras,
                              gt_image: jnp.ndarray, img_height: int,
                              img_width: int, sh_degree: int,
                              bg_color: jnp.ndarray, warm_up: bool,
                              mask: Optional[jnp.ndarray] = None,
                              isect_capacity: Optional[int] = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        net_state: AppearanceNetState = state.extra["__net__"]
        gauss_extra = {k: v for k, v in state.extra.items()
                       if k != "__net__"} or None

        def loss_fn(params, net_params, tap):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=gauss_extra)
            rgbs, op_offset = self._rgbs(gstate, camera, sh_degree,
                                         net_params, warm_up)
            out = self.renderer.forward(
                gstate, camera, img_height, img_width, bg_color, sh_degree,
                means2d_tap=tap, rgbs_override=rgbs,
                opacity_offset=op_offset, isect_capacity=isect_capacity)
            loss, scalars = train_loss(
                out.render, gt_image, mask,
                lambda_dssim=self.metrics_cfg.lambda_dssim,
                rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)
            if op_offset is not None:
                loss = loss + 0.05 * jnp.mean(op_offset)
            return loss, (scalars, out.radii, out.n_dropped)

        (loss, (scalars, radii, n_dropped)), (pgrads, ngrads, tap_grad) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, net_state.params, tap0))

        from ..renderers.tile_renderer import viewspace_grad_scale
        from .density import update_stats
        gscale = viewspace_grad_scale(
            img_width, img_height,
            self.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        updates, opt_state = self.tx.update(pgrads, state.opt_state,
                                            state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if warm_up:
            new_net = net_state
        else:
            n_updates, n_opt = self.net_tx.update(
                ngrads, net_state.opt_state, net_state.params)
            new_net = AppearanceNetState(
                params=optax.apply_updates(net_state.params, n_updates),
                opt_state=n_opt)

        extra = dict(gauss_extra or {})
        extra["__net__"] = new_net
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

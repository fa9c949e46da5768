"""Glossy gaussians: learned environment light + per-gaussian metalness.

TPU-native redesign of the reference GlossyGaussian model + renderer
(/root/reference/internal/models/glossy_gaussian.py,
renderers/glossy_renderer.py + model_components/envlight.py): SH albedo
plus a specular term — metalness-weighted latlong environment-map lookup
at the per-gaussian reflection direction. The env map and per-gaussian
metalness train alongside the gaussians; both ride in
extra['__glossy__'].
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
from ..models.gaussian import GaussianState
from ..models.glossy import EnvLightConfig, glossy_rgbs, init_envmap
from ..ops.sh import sh_to_rgb
from .metrics import train_loss
from .trainer import Trainer, TrainState


@flax.struct.dataclass
class GlossyNetState:
    envmap: jnp.ndarray          # [H, W, 3]
    metalness_raw: jnp.ndarray   # [CAP] (sigmoid-activated)
    opt_state: Any


class GlossyTrainer(Trainer):
    def __init__(self, *args, envlight: EnvLightConfig = None,
                 env_lr: float = 1e-2, metalness_lr: float = 5e-3,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.envlight = envlight or EnvLightConfig()
        self.glossy_tx = optax.multi_transform(
            {"env": optax.adam(env_lr), "metal": optax.adam(metalness_lr)},
            {"envmap": "env", "metalness_raw": "metal"})

    def setup(self, gaussians: GaussianState, cameras_extent: float,
              prune_extent=None) -> TrainState:
        state = super().setup(gaussians, cameras_extent, prune_extent)
        params = {"envmap": init_envmap(self.envlight),
                  "metalness_raw": jnp.full((gaussians.capacity,), -3.0,
                                            jnp.float32)}
        extra = dict(state.extra or {})
        extra["__glossy__"] = GlossyNetState(
            envmap=params["envmap"],
            metalness_raw=params["metalness_raw"],
            opt_state=self.glossy_tx.init(params))
        return state.replace(extra=extra)

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "isect_capacity"))
    def train_step_glossy(self, state: TrainState, camera: Cameras,
                          gt_image: jnp.ndarray, img_height: int,
                          img_width: int, sh_degree: int,
                          bg_color: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          isect_capacity: Optional[int] = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        g: GlossyNetState = state.extra["__glossy__"]
        gauss_extra = {k: v for k, v in state.extra.items()
                       if k != "__glossy__"} or None

        def loss_fn(params, gparams, tap):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=gauss_extra)
            viewdirs = jax.lax.stop_gradient(
                gstate.get_means()) - camera.camera_center
            base = jnp.clip(sh_to_rgb(gstate.get_shs(), viewdirs,
                                      sh_degree) + 0.5, 0.0, None)
            metal = jax.nn.sigmoid(gparams["metalness_raw"])
            rgbs = glossy_rgbs(base, metal * gstate.alive,
                               gparams["envmap"], gstate.get_means(),
                               params.scales, params.rotations,
                               camera.camera_center)
            out = self.renderer.forward(
                gstate, camera, img_height, img_width, bg_color,
                sh_degree, means2d_tap=tap, rgbs_override=rgbs,
                isect_capacity=isect_capacity)
            loss, scalars = train_loss(
                out.render, gt_image, mask,
                lambda_dssim=self.metrics_cfg.lambda_dssim,
                rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)
            scalars = dict(scalars, metal_mean=jnp.mean(metal))
            return loss, (scalars, out.radii, out.n_dropped)

        gparams0 = {"envmap": g.envmap, "metalness_raw": g.metalness_raw}
        (loss, (scalars, radii, n_dropped)), (pgrads, ggrads, tap_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, gparams0, tap0)

        from ..renderers.tile_renderer import viewspace_grad_scale
        from .density import update_stats
        gscale = viewspace_grad_scale(
            img_width, img_height,
            self.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        updates, opt_state = self.tx.update(pgrads, state.opt_state,
                                            state.params)
        params = jax.tree.map(lambda a, u: a + u, state.params, updates)
        g_updates, g_opt = self.glossy_tx.update(ggrads, g.opt_state,
                                                 gparams0)
        gnew = optax.apply_updates(gparams0, g_updates)

        extra = dict(gauss_extra or {})
        extra["__glossy__"] = GlossyNetState(
            envmap=jnp.clip(gnew["envmap"], 0.0, None),
            metalness_raw=gnew["metalness_raw"], opt_state=g_opt)
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

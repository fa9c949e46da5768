"""Dynamic-scene trainers: deformation field over a canonical gaussian set.

Two field backends behind one trainer (reference deformable_renderer.py +
vanilla_gs4d_renderer.py around gs4d_deformation/gs4d_hexplane):

- 'mlp': Deformable-3DGS MLP D(PE(xyz), PE(t)) with annealed smooth
  temporal noise and a warm-up phase (models/deform.py),
- 'hexplane': the 4DGS HexPlane factored spacetime field
  (models/hexplane.py) — the "full 4DGS renderer" path: the field deforms
  means/rotations/scales at the camera's time before projection, for
  training AND viewing.

The field's params + Adam state ride in extra['__deform__'].
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
from ..models.deform import (DeformModelConfig, DeformNetwork, ast_noise,
                             deform_gaussians)
from ..models.gaussian import GaussianState
from ..models.hexplane import HexPlaneDeformation
from .metrics import train_loss
from .trainer import Trainer, TrainState
from .schedulers import exponential_decay


@flax.struct.dataclass
class DeformNetState:
    params: Any
    opt_state: Any


class DeformTrainer(Trainer):
    def __init__(self, *args, field: str = "mlp",
                 deform_cfg: DeformModelConfig = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.deform_cfg = deform_cfg or DeformModelConfig()
        self.field = field
        if field == "hexplane":
            self.deform_net = HexPlaneDeformation()
        else:
            self.deform_net = DeformNetwork(self.deform_cfg)
        d = self.deform_cfg
        self.deform_tx = optax.adam(
            exponential_decay(d.lr_init, d.lr_init * d.lr_final_factor,
                              d.max_steps))

    def setup(self, gaussians: GaussianState, cameras_extent: float,
              prune_extent=None) -> TrainState:
        state = super().setup(gaussians, cameras_extent, prune_extent)
        params = self.deform_net.init(
            jax.random.PRNGKey(2), jnp.zeros((8, 3)),
            jnp.zeros((), jnp.float32))
        extra = dict(state.extra or {})
        extra["__deform__"] = DeformNetState(
            params=params, opt_state=self.deform_tx.init(params))
        return state.replace(extra=extra)

    def deform(self, net_params, gstate: GaussianState, t):
        d_xyz, d_rot, d_scale = self.deform_net.apply(
            net_params, jax.lax.stop_gradient(gstate.params.means), t)
        m = gstate.alive[:, None]
        params = gstate.params.replace(
            means=gstate.params.means + d_xyz * m,
            rotations=gstate.params.rotations + d_rot * m,
            scales=gstate.params.scales + d_scale * m)
        return GaussianState(params=params, alive=gstate.alive,
                             extra=gstate.extra)

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "warm_up",
        "isect_capacity"))
    def train_step_deform(self, state: TrainState, camera: Cameras,
                          gt_image: jnp.ndarray, img_height: int,
                          img_width: int, sh_degree: int,
                          bg_color: jnp.ndarray, warm_up: bool,
                          key: jax.Array,
                          mask: Optional[jnp.ndarray] = None,
                          isect_capacity: Optional[int] = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        net_state: DeformNetState = state.extra["__deform__"]
        gauss_extra = {k: v for k, v in state.extra.items()
                       if k != "__deform__"} or None
        t = camera.time
        if not warm_up and self.field == "mlp":
            t = ast_noise(key, t, state.step, self.deform_cfg.max_steps,
                          self.deform_cfg.ast_noise_scale)

        def loss_fn(params, net_params, tap):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=gauss_extra)
            if not warm_up:
                gstate = self.deform(net_params, gstate, t)
            out = self.renderer.forward(
                gstate, camera, img_height, img_width, bg_color,
                sh_degree, means2d_tap=tap, isect_capacity=isect_capacity)
            loss, scalars = train_loss(
                out.render, gt_image, mask,
                lambda_dssim=self.metrics_cfg.lambda_dssim,
                rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)
            return loss, (scalars, out.radii, out.n_dropped)

        (loss, (scalars, radii, n_dropped)), (pgrads, ngrads, tap_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, net_state.params, tap0)

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
            n_updates, n_opt = self.deform_tx.update(
                ngrads, net_state.opt_state, net_state.params)
            new_net = DeformNetState(
                params=optax.apply_updates(net_state.params, n_updates),
                opt_state=n_opt)

        extra = dict(gauss_extra or {})
        extra["__deform__"] = new_net
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

"""Optimization strategies.

Parity with /root/reference/internal/opt_strategies/:
- Vanilla (opt_strategies/vanilla.py:16-47): step + zero every iteration —
  this is the default behavior of Trainer.train_step.
- GradAcc (opt_strategies/grad_acc.py:7-92): stage-scheduled gradient
  accumulation (1 -> 5 -> 20 at steps 0/20k/24k by default): grads are
  summed across `k` consecutive steps and applied on every k-th.

Functional shape: the accumulation buffer is a grads pytree carried
explicitly; `accumulation_at(step)` gives the stage factor, and the fit loop
calls `train_step_accumulate` with static `apply` on the k-th step.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .trainer import Trainer, TrainState


@dataclasses.dataclass
class GradAccConfig:
    # (from_step, factor) stages, reference grad_acc.py defaults
    stages: Sequence[Tuple[int, int]] = ((0, 1), (20_000, 5), (24_000, 20))

    def accumulation_at(self, step: int) -> int:
        k = 1
        for frm, factor in self.stages:
            if step >= frm:
                k = factor
        return k


class GradAccTrainer(Trainer):
    def __init__(self, *args, grad_acc: GradAccConfig = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.grad_acc = grad_acc or GradAccConfig()

    def init_grad_buffer(self, state: TrainState):
        return jax.tree.map(jnp.zeros_like, state.params)

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "apply",
        "isect_capacity"))
    def train_step_accumulate(self, state: TrainState, grad_buffer, camera,
                              gt_image, img_height: int, img_width: int,
                              sh_degree: int, bg_color, apply: bool,
                              inv_k: float, mask=None,
                              isect_capacity: int = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)

        def loss_fn(params, tap):
            from ..models.gaussian import GaussianState
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=state.extra)
            return self.render_losses(
                gstate, camera, img_height, img_width, bg_color, sh_degree,
                gt_image, mask, tap, jnp.zeros_like(tap), state.step,
                isect_capacity=isect_capacity)

        (loss, (scalars, radii, n_dropped)), (pgrads, tap_grad) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, tap0))

        from ..renderers.tile_renderer import viewspace_grad_scale
        from .density import update_stats
        gscale = viewspace_grad_scale(
            img_width, img_height,
            self.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        grad_buffer = jax.tree.map(lambda b, g: b + g, grad_buffer, pgrads)
        if apply:
            mean_grads = jax.tree.map(lambda g: g * inv_k, grad_buffer)
            updates, opt_state = self.tx.update(mean_grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            grad_buffer = jax.tree.map(jnp.zeros_like, grad_buffer)
        else:
            params, opt_state = state.params, state.opt_state

        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=state.extra)
        return new_state, grad_buffer, dict(scalars,
                                            n_dropped_isects=n_dropped)

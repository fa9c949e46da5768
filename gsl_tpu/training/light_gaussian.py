"""LightGaussian importance-based pruning.

Parity with the reference (/root/reference/internal/gaussian_splatting.py:399-444,
internal/utils/light_gaussian.py, internal/configs/light_gaussian.py:6-11):
global importance = sum over train cameras of per-pixel blend
weights/visibility, v = importance * max_scale^0.1, prune the lowest
`prune_percent` (0.66, decayed per prune step) at configured steps.

The CUDA `hit_pixel_count` kernel is replaced by a gradient identity: the
per-gaussian accumulated blend weight Sum_pixels(alpha_i * T_i) equals
d(sum(image)) / d(c_bias_i) for a per-gaussian scalar channel bias — one
backward pass through the existing differentiable rasterizer, no new kernel.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.gaussian import GaussianState
from .optimizers import zero_opt_state_rows


@dataclasses.dataclass
class LightGaussianPruneConfig:
    prune_steps: Sequence[int] = ()
    prune_decay: float = 0.6
    prune_percent: float = 0.66
    v_pow: float = 0.1

    def instantiate(self):
        return self


def accumulate_blend_weights(render_fn, gstate: GaussianState,
                             cameras, *render_args) -> jnp.ndarray:
    """Sum over cameras of per-gaussian blend-weight totals.

    render_fn(gstate, camera, channel_bias) must return an image where
    `channel_bias` [CAP] is added to every composited channel of gaussian i
    (so d(sum image)/d(bias) = per-gaussian blend weight)."""
    cap = gstate.capacity
    total = jnp.zeros((cap,), jnp.float32)

    def one(camera):
        def f(bias):
            img = render_fn(gstate, camera, bias, *render_args)
            return jnp.sum(img)
        return jax.grad(f)(jnp.zeros((cap,), jnp.float32))

    for i in range(len(cameras)):
        total = total + one(cameras[i])
    return total


def prune_by_importance(gstate: GaussianState, opt_state,
                        importance: jnp.ndarray, prune_percent: float,
                        v_pow: float = 0.1):
    """Keep the top (1 - prune_percent) by v = importance * max_scale^v_pow
    (reference light_gaussian.py get_prune_mask semantics)."""
    cap = gstate.capacity
    max_scale = jnp.max(jnp.exp(gstate.params.scales), axis=-1)
    v = importance * jnp.power(jnp.maximum(max_scale, 1e-12), v_pow)
    v = jnp.where(gstate.alive, v, -jnp.inf)

    n_alive = jnp.sum(gstate.alive.astype(jnp.int32))
    n_prune = (n_alive.astype(jnp.float32) * prune_percent).astype(jnp.int32)
    order = jnp.argsort(v)  # ascending; -inf (dead) first
    n_dead = cap - n_alive
    # prune the lowest n_prune among alive: positions [n_dead, n_dead+n_prune)
    rank = jnp.zeros((cap,), jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    prune = gstate.alive & (rank < n_dead + n_prune)
    alive = gstate.alive & ~prune
    if opt_state is not None:
        opt_state = zero_opt_state_rows(opt_state, prune, cap)
    return (GaussianState(params=gstate.params, alive=alive,
                          extra=gstate.extra), opt_state,
            jnp.sum(prune.astype(jnp.int32)))

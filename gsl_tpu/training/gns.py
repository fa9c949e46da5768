"""GNS: Gradient-Driven Natural Selection for compact 3DGS.

TPU-native redesign of the reference GNS density controller
(/root/reference/internal/density_controllers/gns.py:1-515):

- budgeted densification: candidates pass the vanilla gradient threshold,
  then `n_addable = budget_by_step - n_current` of them are sampled by
  edge-aware importance (per-gaussian blend weights against edge maps —
  the CUDA `rasterize_to_vis_aware_weights` is replaced by the repo's
  gradient identity: d(sum(edges * bias_image))/d(bias_i) is exactly the
  edge-weighted blend-weight sum),
- selected gaussians LONG-AXIS split (N=2): children offset +-3*s_max*rate
  along the rotated longest axis, the longest axis shrunk by
  (1-rate)/rate_h and the others scaled by rate_h = sqrt(1-rate^2),
  opacity * 0.6, original removed (gns.py:336-383),
- natural-selection phase (opacity_reg_from..until): an adaptive opacity
  regularizer (weight tuned toward a declining per-step opacity goal)
  pushes redundant gaussians toward zero opacity, pruned every
  `opacity_reg_interval`, with a final opacity-multinomial prune to the
  budget; opacity updates run at 4x during the phase (the reference
  raises the opacity LR; here the post-Adam opacity update is scaled —
  identical effect for Adam).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussian import GaussianState, inverse_sigmoid
from ..ops.transforms import normalize_quat, quat_to_rotmat
from .density import (DensityControlState, VanillaDensityControllerConfig,
                      init_density_state)
from .optimizers import zero_opt_state_rows


@dataclasses.dataclass
class GNSDensityControllerConfig(VanillaDensityControllerConfig):
    budget: int = -1
    budget_intermediate_scale: float = 3.0
    opacity_reg_interval: int = 50
    opacity_reg_from: int = 15_000
    opacity_reg_until: int = 23_000
    opacity_reg_weight: float = 2e-4
    opacity_reg_prior_free_steps: int = 1_000
    natural_selection_min_opacity: float = 0.001
    n_sample_cameras: int = 10
    opacity_reduction: float = 0.6
    split_distance: float = 0.45
    edge_aware: bool = True
    opacity_lr_factor: float = 4.0
    opacity_reg_restore_lr_after: int = 1_000


def gns_budget_at(cfg: GNSDensityControllerConfig, step: int) -> int:
    """sqrt-shaped budget curve toward budget * intermediate_scale
    (gns.py get_budget_by_step)."""
    start = cfg.densify_from_iter
    end = cfg.densify_until_iter - start
    rate = (step - start) / max(end - start, 1)
    peak = cfg.budget * cfg.budget_intermediate_scale
    if rate >= 1:
        return int(peak)
    return int(np.sqrt(max(rate, 0.0)) * peak)


def edge_weighted_blend_scores(renderer, gstate: GaussianState, cameras,
                               edge_maps, bg, sh_degree) -> jnp.ndarray:
    """Per-gaussian sum over pixels of edge_weight * blend_weight, averaged
    over cameras (the vis-aware-weights accumulation, gns.py:131-168)."""
    from .taming import _normalize

    cap = gstate.capacity
    total = jnp.zeros((cap,), jnp.float32)
    for cam, edges in zip(cameras, edge_maps):
        H, W = int(cam.height), int(cam.width)

        def f(bias):
            out = renderer.forward(
                gstate, cam, H, W, bg, sh_degree,
                rgbs_override=renderer.get_rgbs(gstate, cam, sh_degree)
                + bias[:, None])
            return jnp.sum(edges[..., None] * out.render)

        w = jax.grad(f)(jnp.zeros((cap,), jnp.float32))
        total = total + _normalize(1.0, w, gstate.alive)
    return total / max(len(cameras), 1)


def gns_densify(key: jax.Array, gstate: GaussianState, opt_state,
                dstate: DensityControlState,
                cfg: GNSDensityControllerConfig, importance: jnp.ndarray,
                step_budget: jnp.ndarray):
    """Budgeted long-axis-split densification + opacity prune."""
    p = gstate.params
    cap = gstate.capacity
    alive = gstate.alive

    grads = jnp.where(dstate.denom > 0.0,
                      dstate.grad_accum / jnp.maximum(dstate.denom, 1.0),
                      0.0)
    cand = (grads >= cfg.densify_grad_threshold) & alive

    n_current = jnp.sum(alive.astype(jnp.int32))
    n_cand = jnp.sum(cand.astype(jnp.int32))
    budget = jnp.minimum(step_budget, n_current + n_cand)
    n_addable = jnp.maximum(budget - n_current, 0)

    # sample n_addable candidates without replacement, proportional to
    # importance: Gumbel top-k trick with a dynamic k threshold
    imp = jnp.where(cand, jnp.maximum(importance, 1e-12), 0.0)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, (cap,), jnp.float32, 1e-9, 1.0)))
    scores = jnp.where(cand, jnp.log(imp) + g, -jnp.inf)
    order = jnp.argsort(-scores)
    rank = jnp.zeros((cap,), jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    sel = cand & (rank < n_addable)

    # ---- long-axis split (both children replace the original) ----
    scales_act = jnp.exp(p.scales)
    sdim = p.scales.shape[-1]
    max_idx = jnp.argmax(scales_act, axis=-1)
    onehot = jax.nn.one_hot(max_idx, sdim, dtype=jnp.float32)
    s_max = jnp.max(scales_act, axis=-1, keepdims=True)

    rate = cfg.split_distance
    rate_w = 1.0 - rate
    rate_h = float(np.sqrt(1.0 - rate * rate))
    axis_local = onehot * s_max * 3.0 * rate               # [CAP, sdim]
    R = quat_to_rotmat(normalize_quat(p.rotations))
    off = jnp.einsum("nij,nj->ni", R[:, :, :sdim], axis_local)

    new_scales_act = (scales_act * (1.0 - onehot)
                      + onehot * s_max * rate_w / rate_h) * rate_h
    new_scales = jnp.log(jnp.maximum(new_scales_act, 1e-12))
    op_act = jax.nn.sigmoid(p.opacities) * cfg.opacity_reduction
    new_op = inverse_sigmoid(jnp.clip(op_act, 1e-6, 1.0 - 1e-6))

    # child 1 replaces the original in place
    params = p.replace(
        means=jnp.where(sel[:, None], p.means + off, p.means),
        scales=jnp.where(sel[:, None], new_scales, p.scales),
        opacities=jnp.where(sel[:, None], new_op, p.opacities))

    # child 2 into free slots
    want = sel.astype(jnp.int32)
    cum = jnp.cumsum(want)
    total_new = cum[-1]
    free_slots = jnp.argsort(alive)
    n_free = cap - n_current
    j = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.minimum(jnp.searchsorted(cum, j, side="right"), cap - 1
                      ).astype(jnp.int32)
    valid_new = (j < total_new) & (j < n_free)
    dest = jnp.where(valid_new, free_slots[j], cap)

    child = jax.tree.map(lambda arr: arr[src], p)
    child = child.replace(means=p.means[src] - off[src],
                          scales=new_scales[src],
                          opacities=new_op[src])
    params = jax.tree.map(
        lambda dst_arr, values: dst_arr.at[dest].set(values, mode="drop"),
        params, child)
    alive = alive.at[dest].set(True, mode="drop")

    # ---- opacity prune ----
    prune = (jax.nn.sigmoid(params.opacities[:, 0])
             < cfg.cull_opacity_threshold)
    alive = alive & ~prune

    touched = jnp.zeros((cap,), bool).at[dest].set(True, mode="drop")
    touched = touched | sel | prune
    opt_state = zero_opt_state_rows(opt_state, touched, cap)
    n_truncated = jnp.maximum(total_new - n_free, 0)
    return (GaussianState(params=params, alive=alive, extra=gstate.extra),
            opt_state, init_density_state(cap), n_truncated)


def gns_opacity_reg_loss(params, alive, weight, prior_phase):
    """Adaptive opacity decay (gns.py:388-440). `prior_phase`: weight the
    mean by each gaussian's opacity (higher opacity decays faster);
    afterwards a uniform, stronger pull."""
    raw = params.opacities[:, 0]
    n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    op = jax.nn.sigmoid(raw)
    rate_l = jnp.maximum(0.05, 1.0 - op)
    prior = weight * (jnp.sum(jnp.where(alive, (raw + 20.0) / rate_l, 0.0))
                      / n_alive) ** 2
    uniform = 3.0 * weight * (jnp.sum(jnp.where(alive, raw, 0.0))
                              / n_alive + 20.0) ** 2
    return jnp.where(prior_phase, prior, uniform)


@jax.jit
def prune_by_opacity(gstate: GaussianState, opt_state, threshold):
    prune = (jax.nn.sigmoid(gstate.params.opacities[:, 0]) < threshold) \
        & gstate.alive
    alive = gstate.alive & ~prune
    opt_state = zero_opt_state_rows(opt_state, prune, gstate.capacity)
    return (GaussianState(params=gstate.params, alive=alive,
                          extra=gstate.extra), opt_state,
            jnp.sum(prune.astype(jnp.int32)))


def final_budget_prune(key, gstate: GaussianState, opt_state, budget: int):
    """Opacity-multinomial sample of `budget` survivors (gns.py:488-500)."""
    cap = gstate.capacity
    op = jnp.where(gstate.alive,
                   jnp.maximum(jax.nn.sigmoid(
                       gstate.params.opacities[:, 0]), 1e-9), 0.0)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, (cap,), jnp.float32, 1e-9, 1.0)))
    scores = jnp.where(gstate.alive, jnp.log(op) + g, -jnp.inf)
    order = jnp.argsort(-scores)
    rank = jnp.zeros((cap,), jnp.int32).at[order].set(
        jnp.arange(cap, dtype=jnp.int32))
    keep = gstate.alive & (rank < budget)
    removed = gstate.alive & ~keep
    opt_state = zero_opt_state_rows(opt_state, removed, cap)
    return (GaussianState(params=gstate.params, alive=keep,
                          extra=gstate.extra), opt_state)


class GNSController:
    """Host-side schedule + adaptive state (reg weight, opacity goal).
    Mirrors the reference module's buffers; transient across resume like
    the reference's non-persistent ones."""

    def __init__(self, cfg: GNSDensityControllerConfig):
        assert cfg.budget > 0, "GNS requires an explicit gaussian budget"
        self.cfg = cfg
        self.reg_weight = cfg.opacity_reg_weight
        self.opacity_min = None
        self.final_pruned = False
        self.prune_step = None

    def in_reg_phase(self, step: int, n_alive: int) -> bool:
        cfg = self.cfg
        return (cfg.opacity_reg_from <= step <= cfg.opacity_reg_until
                and n_alive > cfg.budget and not self.final_pruned)

    def opacity_update_factor(self, step: int, n_alive: int) -> float:
        if self.in_reg_phase(step, n_alive):
            return self.cfg.opacity_lr_factor
        if (self.prune_step is not None and step
                < self.prune_step + self.cfg.opacity_reg_restore_lr_after):
            return self.cfg.opacity_lr_factor
        return 1.0

    def update_reg_weight(self, step: int, opacities_sorted: np.ndarray,
                          n_alive: int):
        """Every 100 steps: tune the weight toward the declining opacity
        goal (gns.py:388-430)."""
        cfg = self.cfg
        idx = max(n_alive - cfg.budget, 0)
        value = float(opacities_sorted[idx]) if idx < len(
            opacities_sorted) else 0.0
        if self.opacity_min is None:
            self.opacity_min = value * 0.8
            return
        if (step - 1) % 100 != 0:
            return
        denom = max(cfg.opacity_reg_until - cfg.opacity_reg_from - 1000, 1)
        goal = max((1.0 - (step - cfg.opacity_reg_from) / denom)
                   * self.opacity_min, 0.0)
        if value < goal * 0.9:
            self.reg_weight *= 0.8
        elif value > goal * 1.1:
            self.reg_weight *= 1.2


def make_gns_step(trainer, cfg: GNSDensityControllerConfig):
    """trainer.train_step variant with the adaptive opacity regularizer in
    the loss and a traced post-Adam opacity-update factor (the reference
    raises the opacity LR 4x during the natural-selection phase)."""
    from .density import update_stats
    from ..renderers.tile_renderer import viewspace_grad_scale
    from .trainer import TrainState

    @functools.partial(jax.jit, static_argnames=(
        "img_height", "img_width", "sh_degree", "isect_capacity"))
    def step(state: TrainState, camera, gt_image, img_height: int,
             img_width: int, sh_degree: int, bg_color, reg_weight,
             prior_phase, opacity_factor, mask=None, isect_capacity=None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)

        def loss_fn(params, tap):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=state.extra)
            loss, aux = trainer.render_losses(
                gstate, camera, img_height, img_width, bg_color, sh_degree,
                gt_image, mask, tap, jnp.zeros_like(tap), state.step,
                isect_capacity=isect_capacity)
            reg = gns_opacity_reg_loss(params, state.alive, reg_weight,
                                       prior_phase)
            return loss + reg, aux

        (loss, (scalars, radii, n_dropped)), (pgrads, tap_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, tap0)

        gscale = viewspace_grad_scale(
            img_width, img_height,
            trainer.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        updates, opt_state = trainer.tx.update(pgrads, state.opt_state,
                                               state.params)
        updates = updates.replace(
            opacities=updates.opacities * opacity_factor)
        params = jax.tree.map(lambda a, u: a + u, state.params, updates)
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=state.extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

    return step

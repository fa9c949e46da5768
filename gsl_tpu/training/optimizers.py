"""Per-property optimizers over the GaussianState pytree.

Functional replacement for the reference per-param-group Adam setup
(/root/reference/internal/models/vanilla_gaussian.py:241-309) and the
optimizer-state surgery utilities
(/root/reference/internal/density_controllers/density_controller.py:47-209):
with capacity-padded arrays, "surgery" reduces to masked row edits on the
Adam moment pytree (see `zero_opt_state_rows`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.gaussian import GaussianParams, OptimizationConfig
from .schedulers import exponential_decay


def build_gaussian_optimizer(opt_cfg: OptimizationConfig,
                             spatial_lr_scale: float,
                             has_appearance_features: bool = False,
                             appearance_feature_lr: float = 2e-3,
                             has_pvg: bool = False,
                             pvg_lr: float = 1e-3):
    """optax.multi_transform with one Adam per Gaussian property, reference
    LRs (means exp-decayed x spatial_lr_scale)."""
    scale = (opt_cfg.spatial_lr_scale
             if opt_cfg.spatial_lr_scale > 0 else spatial_lr_scale)
    means_schedule = exponential_decay(
        lr_init=opt_cfg.means_lr_init * scale,
        lr_final=opt_cfg.means_lr_init * opt_cfg.means_lr_final_factor * scale,
        max_steps=opt_cfg.means_lr_max_steps,
    )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=opt_cfg.eps)

    transforms = {
        "means": adam(means_schedule),
        "scales": adam(opt_cfg.scales_lr),
        "rotations": adam(opt_cfg.rotations_lr),
        "opacities": adam(opt_cfg.opacities_lr),
        "shs_dc": adam(opt_cfg.shs_dc_lr),
        "shs_rest": adam(opt_cfg.shs_dc_lr / opt_cfg.shs_rest_lr_div),
    }
    af_label = None
    if has_appearance_features:
        transforms["appearance_features"] = adam(appearance_feature_lr)
        af_label = "appearance_features"
    pvg_label = None
    if has_pvg:
        transforms["pvg"] = adam(pvg_lr)
        pvg_label = "pvg"
    labels = GaussianParams(
        means="means", scales="scales", rotations="rotations",
        opacities="opacities", shs_dc="shs_dc", shs_rest="shs_rest",
        appearance_features=af_label,
        t_centers=pvg_label, t_scales=pvg_label, velocities=pvg_label,
    )
    return optax.multi_transform(transforms, labels)


def zero_opt_state_rows(opt_state: Any, row_mask: jnp.ndarray,
                        capacity: int) -> Any:
    """Zero Adam moments (mu/nu) for slots where row_mask is True.

    The functional analogue of the reference's
    `replace_tensors_to_optimizers_` zeroing exp_avg/exp_avg_sq for replaced
    rows. Applies to every optimizer-state leaf whose leading dim == capacity.
    """
    def fix(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 \
                and leaf.shape[0] == capacity and jnp.issubdtype(
                    leaf.dtype, jnp.floating):
            m = row_mask.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            # jnp.where (not multiply): a NaN moment times 0 stays NaN
            return jnp.where(m, 0.0, leaf)
        return leaf

    return jax.tree.map(fix, opt_state)


def grow_opt_state(old_state: Any, new_state: Any, old_capacity: int) -> Any:
    """Carry Adam moments (and schedule counts) across a capacity growth.

    `new_state` is `tx.init(grown_params)` (zero moments at the new
    capacity); every leaf of `old_state` whose leading dim == old_capacity is
    written into the head of the corresponding new leaf, and every other
    leaf (scalar `count`, etc.) keeps its OLD value so LR schedules continue
    mid-training. Functional analogue of the reference's
    `cat_tensors_to_optimizers_` zero-padding only the new rows
    (/root/reference/internal/density_controllers/density_controller.py:47-103).
    """
    def fix(old, new):
        if (isinstance(new, jnp.ndarray) and getattr(old, "ndim", -1) ==
                getattr(new, "ndim", -2) and new.ndim >= 1
                and old.shape[0] == old_capacity
                and new.shape[0] > old_capacity
                and old.shape[1:] == new.shape[1:]):
            return new.at[:old_capacity].set(old)
        return old

    return jax.tree.map(fix, old_state, new_state)


def zero_opacity_opt_state(opt_state: Any, opacities_shape) -> Any:
    """Zero Adam moments of the `opacities` leaf ONLY, targeted by pytree
    path (reference `_reset_opacities` replace_tensors selector,
    vanilla_density_controller.py:270-278).

    Shape-based matching would also clobber any other [CAP, 1] leaf (PVG's
    t_centers/t_scales share that shape), so a leaf is zeroed only when the
    string 'opacities' appears in its path — either the multi_transform
    label dict key or the GaussianParams attribute name.
    """
    from jax.tree_util import tree_map_with_path

    def fix(path, leaf):
        if not (isinstance(leaf, jnp.ndarray)
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.shape == tuple(opacities_shape)):
            return leaf
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        if any(n == "opacities" for n in names):
            return jnp.zeros_like(leaf)
        return leaf

    return tree_map_with_path(fix, opt_state)


def selective_adam_update(updates, visible: jnp.ndarray):
    """Visibility-gated parameter updates: zero the update rows of gaussians
    that did not hit any pixel this step.

    Functional equivalent of gsplat's `SelectiveAdam` / diff-accel's
    `SparseGaussianAdam` (reference internal/optimizers.py:14-91): those
    CUDA optimizers skip the Adam step for invisible gaussians; here the
    same effect is a masked update (moments for skipped rows do not decay in
    the CUDA version either, so callers should combine this with
    `freeze_opt_state_rows` when exact parity matters; in practice zeroed
    updates alone match training behavior).
    """
    keep = visible.astype(jnp.float32)

    def f(u):
        if isinstance(u, jnp.ndarray) and u.ndim >= 1 \
                and u.shape[0] == keep.shape[0]:
            return u * keep.reshape((-1,) + (1,) * (u.ndim - 1))
        return u

    return jax.tree.map(f, updates)

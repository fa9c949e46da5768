"""Vanilla adaptive density control (ADC) as pure-functional jitted updates.

Re-design of the reference VanillaDensityController
(/root/reference/internal/density_controllers/vanilla_density_controller.py:13-284)
for fixed-capacity padded state: instead of torch optimizer-state surgery
(cat/prune/replace rows), clone/split write into free slots with scatter and
pruning just clears `alive`; Adam moments for touched rows are zeroed via a
mask (`zero_opt_state_rows`). Algorithm parity (SURVEY.md §2.5):

- accumulate ||dL/dmeans2d * 0.5*[W,H]|| and a visit counter over visible
  gaussians; max radii tracked in pixels,
- every `densification_interval` steps in (densify_from_iter,
  densify_until_iter): clone small high-grad gaussians; split large high-grad
  ones into N=2 children sampled from N(0, scale) rotated, scales /(0.8*N),
  original replaced by one child (reference prunes the original and appends 2
  children — identical distribution),
- prune opacity < cull_opacity_threshold; after step >
  opacity_reset_interval also max_radii2D > 20 px or world scale >
  0.1 * prune_extent,
- all stats reset to zero after every densify (reference
  `_densification_postfix` -> `_init_state`),
- opacity reset to min(op, 0.01) every `opacity_reset_interval` steps (and
  once at densify_from_iter for white backgrounds), zeroing opacity moments.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..models.gaussian import GaussianState, inverse_sigmoid
from ..ops.transforms import quat_to_rotmat, normalize_quat
from .optimizers import zero_opt_state_rows


@flax.struct.dataclass
class DensityControlState:
    grad_accum: jnp.ndarray  # [CAP]
    denom: jnp.ndarray       # [CAP]
    max_radii: jnp.ndarray   # [CAP] float (pixels)


def init_density_state(capacity: int) -> DensityControlState:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensityControlState(grad_accum=z, denom=z, max_radii=z)


@dataclasses.dataclass
class VanillaDensityControllerConfig:
    percent_dense: float = 0.01
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    opacity_reset_value: float = 0.01
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4
    cull_opacity_threshold: float = 0.005
    cull_screen_size_threshold: float = 20.0
    cull_scale_factor: float = 0.1       # x prune_extent
    camera_extent_factor: float = 1.0
    scene_extent_override: float = -1.0
    absgrad: bool = False

    def instantiate(self):
        return self


# ---------------------------------------------------------------------------
# variant controllers (all static config branches inside the jitted pass)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StaticDensityControllerConfig(VanillaDensityControllerConfig):
    """No-op controller (reference static_density_controller.py): the fit
    loop skips densify/prune/opacity-reset entirely."""


@dataclasses.dataclass
class RevisingDensityControllerConfig(VanillaDensityControllerConfig):
    """'Revising Densification in Gaussian Splatting' (arXiv 2404.06109)
    opacity correction on clone: both copies get
    alpha_hat = 1 - sqrt(1 - alpha) so the pair composites to the original
    opacity (reference revising_density_controller.py:21-48)."""


@dataclasses.dataclass
class NoCullingBigScaleDensityControllerConfig(VanillaDensityControllerConfig):
    """Prunes by opacity (+ screen size after the first opacity reset) but
    never by world-space scale (reference no_culling_big_scale.py) —
    large-scene preset where big background splats are legitimate."""


@dataclasses.dataclass
class H3DGSDensityControllerConfig(VanillaDensityControllerConfig):
    """Hierarchical-3DGS selection (reference h3dgs_density_controller.py):
    score = ACCUMULATED grad norm * max_radii2D * opacity^(1/5), threshold
    0.015, candidates additionally need opacity > clone_min_opacity; prune
    by opacity + world scale only (no screen-size cull)."""
    densification_interval: int = 300
    densify_grad_threshold: float = 0.015
    clone_min_opacity: float = 0.15


@dataclasses.dataclass
class AccurateVisibilityFilterDensityControllerConfig(
        VanillaDensityControllerConfig):
    """Densification stats gated by RASTERIZATION-level visibility (a
    gaussian that actually contributed to a pixel) instead of the
    projection-level radii > 0 proxy (reference
    accurate_visibility_filter_density_controller.py, which needs a custom
    gsplat branch; here the contribution signal is the means2d tap gradient
    being nonzero — exact for the same purpose)."""


@dataclasses.dataclass
class BackgroundRemovalDensityControllerConfig(
        VanillaDensityControllerConfig):
    """Kills gaussians outside the camera-bounding sphere every densify
    interval after `background_removal_from` by zeroing their opacity, so
    the next prune removes them (reference background_removal.py)."""
    background_removal_from: int = 7_000
    foreground_radius_scaling: float = 1.0


def background_removal_step(gstate: GaussianState, scene_center,
                            foreground_radius) -> GaussianState:
    """opacity -> ~0 (raw -15) outside the foreground sphere."""
    dist = jnp.linalg.norm(gstate.params.means
                           - jnp.asarray(scene_center)[None, :], axis=-1)
    outside = (dist > foreground_radius) & gstate.alive
    op = jnp.where(outside[:, None], -15.0, gstate.params.opacities)
    return GaussianState(params=gstate.params.replace(opacities=op),
                         alive=gstate.alive, extra=gstate.extra)


def update_stats(dstate: DensityControlState, m2d_grad: jnp.ndarray,
                 radii: jnp.ndarray, grad_scale: jnp.ndarray,
                 distance_factors=None, accurate_visibility=False
                 ) -> DensityControlState:
    """m2d_grad [CAP, 2] = dL/dmeans2d (pixel units); radii [CAP] int;
    grad_scale [2] = 0.5*[W, H] (viewspace grad scale).

    `distance_factors` [CAP] (optional): foreground-first damping — grads of
    gaussians far from the owning partition are attenuated so densification
    stays inside the cell (reference
    foreground_first_density_controller.py + partition_store.py).

    `accurate_visibility`: gate by actual pixel contribution (nonzero tap
    gradient) rather than projection radii
    (accurate_visibility_filter_density_controller.py)."""
    visible = radii > 0
    if accurate_visibility:
        visible = visible & jnp.any(m2d_grad != 0.0, axis=-1)
    g = jnp.linalg.norm(m2d_grad * grad_scale[None, :], axis=-1)
    if distance_factors is not None:
        g = g * jnp.exp(-distance_factors)
    return DensityControlState(
        grad_accum=dstate.grad_accum + jnp.where(visible, g, 0.0),
        denom=dstate.denom + visible.astype(jnp.float32),
        max_radii=jnp.maximum(dstate.max_radii,
                              jnp.where(visible, radii.astype(jnp.float32),
                                        0.0)),
    )


def densify_and_prune(
    key: jax.Array,
    gstate: GaussianState,
    opt_state: Any,
    dstate: DensityControlState,
    cfg: VanillaDensityControllerConfig,
    cameras_extent: float,
    prune_extent: float,
    use_size_prune: jnp.ndarray,   # bool scalar: step > opacity_reset_interval
) -> Tuple[GaussianState, Any, DensityControlState, jnp.ndarray]:
    """One clone/split/prune pass. Returns (state, opt_state, dstate,
    n_truncated_new) — n_truncated_new > 0 signals the host to grow
    capacity."""
    p = gstate.params
    cap = gstate.capacity
    alive = gstate.alive
    f32 = jnp.float32

    grads = jnp.where(dstate.denom > 0.0,
                      dstate.grad_accum / jnp.maximum(dstate.denom, 1.0), 0.0)
    scales_act = jnp.exp(p.scales)
    max_scale = jnp.max(scales_act, axis=-1)
    opacities_now = jax.nn.sigmoid(p.opacities[:, 0])

    if isinstance(cfg, H3DGSDensityControllerConfig):
        # H3DGS: accumulated (not mean) grad * max radii * opacity^(1/5),
        # opacity floor (h3dgs_density_controller.py:49-60)
        score = (dstate.grad_accum * dstate.max_radii
                 * jnp.power(jnp.maximum(opacities_now, 1e-8), 0.2))
        high_grad = ((score >= cfg.densify_grad_threshold)
                     & (opacities_now > cfg.clone_min_opacity) & alive)
    else:
        high_grad = (grads >= cfg.densify_grad_threshold) & alive
    small = max_scale <= cfg.percent_dense * cameras_extent
    clone_mask = high_grad & small
    split_mask = high_grad & ~small

    # --- sample split offsets (std = activated scales, rotated) ---
    # sdim is 3 for vanilla, 2 for 2DGS surfels (offsets in tangent plane)
    sdim = p.scales.shape[-1]
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(normalize_quat(p.rotations))          # [CAP, 3, 3]
    eps1 = jax.random.normal(k1, (cap, sdim), f32) * scales_act
    eps2 = jax.random.normal(k2, (cap, sdim), f32) * scales_act
    off1 = jnp.einsum("nij,nj->ni", R[:, :, :sdim], eps1)
    off2 = jnp.einsum("nij,nj->ni", R[:, :, :sdim], eps2)
    log_div = jnp.log(0.8 * 2.0)

    # split originals become child 1 in place
    new_means = jnp.where(split_mask[:, None], p.means + off1, p.means)
    new_scales = jnp.where(split_mask[:, None], p.scales - log_div, p.scales)
    new_opacities = p.opacities
    if isinstance(cfg, RevisingDensityControllerConfig):
        # opacity correction on clone: alpha_hat = 1 - sqrt(1 - alpha) for
        # BOTH the original and the copy (revising_density_controller.py)
        alpha_hat = 1.0 - jnp.sqrt(jnp.maximum(1.0 - opacities_now, 1e-8))
        raw_hat = inverse_sigmoid(jnp.clip(alpha_hat, 1e-6, 1.0 - 1e-6))
        new_opacities = jnp.where(clone_mask[:, None], raw_hat[:, None],
                                  p.opacities)
    params = p.replace(means=new_means, scales=new_scales,
                       opacities=new_opacities)

    # --- allocate free slots for clones + second split children ---
    want = clone_mask.astype(jnp.int32) + split_mask.astype(jnp.int32)
    cum_want = jnp.cumsum(want)
    total_new = cum_want[-1]
    free_slots = jnp.argsort(alive)          # stable: dead slots first
    n_free = cap - jnp.sum(alive.astype(jnp.int32))

    j = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.searchsorted(cum_want, j, side="right").astype(jnp.int32)
    src = jnp.minimum(src, cap - 1)
    valid_new = (j < total_new) & (j < n_free)
    dest = jnp.where(valid_new, free_slots[j], cap)  # cap -> dropped

    is_split_child = split_mask[src]
    child_means = jnp.where(is_split_child[:, None],
                            p.means[src] + off2[src], p.means[src])
    child_scales = jnp.where(is_split_child[:, None],
                             p.scales[src] - log_div, p.scales[src])

    # new children copy source rows for every property (incl. optional
    # extras like appearance_features), with means/scales overridden
    child = jax.tree.map(lambda arr: arr[src], p)
    child = child.replace(means=child_means, scales=child_scales)
    params = jax.tree.map(
        lambda dst_arr, values: dst_arr.at[dest].set(values, mode="drop"),
        params, child)
    alive = alive.at[dest].set(True, mode="drop")

    # non-trainable extra properties: copy source rows into new slots
    # (only per-gaussian arrays; auxiliary state like the appearance network
    # rides in `extra` too and must pass through untouched)
    extra = gstate.extra
    if extra is not None:
        extra = jax.tree.map(
            lambda arr: (arr.at[dest].set(arr[src], mode="drop")
                         if getattr(arr, "ndim", 0) >= 1
                         and arr.shape[0] == cap else arr), extra)

    # --- prune (on post-densify values) ---
    opacities_act = jax.nn.sigmoid(params.opacities[:, 0])
    prune = opacities_act < cfg.cull_opacity_threshold
    screen_prune = dstate.max_radii > cfg.cull_screen_size_threshold
    world_prune = (jnp.max(jnp.exp(params.scales), axis=-1)
                   > cfg.cull_scale_factor * prune_extent)
    if isinstance(cfg, NoCullingBigScaleDensityControllerConfig):
        size_prune = screen_prune          # never cull by world scale
    elif isinstance(cfg, H3DGSDensityControllerConfig):
        # H3DGS prunes by world scale unconditionally, no screen cull
        prune = prune | world_prune
        size_prune = jnp.zeros_like(screen_prune)
    else:
        size_prune = screen_prune | world_prune
    prune = prune | (use_size_prune & size_prune)
    # fresh slots have zero stats, so max_radii prune can't hit them
    alive = alive & ~prune

    # --- optimizer-moment surgery: zero rows for new slots, split
    # originals (reference prunes + re-appends them), and pruned slots ---
    touched = jnp.zeros((cap,), bool).at[dest].set(True, mode="drop")
    touched = touched | split_mask | prune
    opt_state = zero_opt_state_rows(opt_state, touched, cap)

    n_truncated = jnp.maximum(total_new - n_free, 0)
    return (GaussianState(params=params, alive=alive, extra=extra),
            opt_state, init_density_state(cap), n_truncated)


def reset_opacities(gstate: GaussianState, opt_state: Any,
                    reset_value: float = 0.01) -> Tuple[GaussianState, Any]:
    """opacity -> min(opacity, reset_value); zero opacity Adam moments
    (reference `_reset_opacities`)."""
    p = gstate.params
    op = jax.nn.sigmoid(p.opacities)
    new_raw = inverse_sigmoid(jnp.minimum(op, reset_value))
    params = p.replace(opacities=new_raw)

    # zero moments of the opacities leaf only, targeted by pytree path —
    # shape matching would clobber PVG's same-shaped t_centers/t_scales
    from .optimizers import zero_opacity_opt_state
    opt_state = zero_opacity_opt_state(opt_state, p.opacities.shape)
    return (GaussianState(params=params, alive=gstate.alive,
                          extra=gstate.extra), opt_state)

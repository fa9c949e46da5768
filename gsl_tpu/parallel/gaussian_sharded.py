"""Multi-chip training: camera data-parallelism x Gaussian-sharded model
parallelism over a (dp, mp) device mesh.

TPU-native redesign of the reference MPStrategy + GSplatDistributedRenderer
(/root/reference/internal/mp_strategy.py:29-129,
 /root/reference/internal/renderers/gsplat_distributed_renderer.py:17-516):

reference (NCCL)                          ->  this module (XLA / shard_map)
  rank owns a Gaussian shard                  params sharded over mesh axis
                                              'mp' (leading CAP dim)
  all_gather(camera ids)                      lax.all_gather(cameras, 'mp')
  project local shard for all ranks' cams     vmap(project) over the gathered
                                              camera batch
  two ragged torch.distributed all_to_alls    one fixed-capacity
  (means2d|depth|conic|comp|opacity|rgb)      lax.all_to_all on a packed
                                              [mp, N_local, D] payload
  local isect + rasterize own image           unchanged (per-device tiles)
  DDP gradient averaging across data ranks    lax.psum(grads, 'dp')
  backward all_to_all (torch.distributed.nn)  automatic: jax.grad transposes
                                              the collective inside shard_map

The exchange is differentiable by construction; densification stats flow
through the same means2d tap as the single-chip path. Dead/padded slots ride
along with opacity 0 (fixed capacity replaces the reference's ragged
visible-count exchange; a top-K visibility compaction is a later perf knob).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.cameras import Cameras
from ..models.gaussian import GaussianParams, GaussianState
from ..ops.projection import Projections, project_gaussians
from ..ops.rasterize_jax import rasterize_tiles
from ..ops.rasterize_pallas import isect_encode_padded, rasterize_pallas
from ..ops.sh import sh_to_rgb
from ..ops.tiling import isect_encode
from ..training.metrics import train_loss


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              mp: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if dp is None and mp is None:
        mp = min(n, 4)
        dp = n // mp
    elif dp is None:
        dp = n // mp
    elif mp is None:
        mp = n // dp
    assert dp * mp == n, (dp, mp, n)
    arr = np.asarray(devs[:n]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def _project_and_color(params: GaussianParams, alive, camera: Cameras,
                       img_height: int, img_width: int, sh_degree: int,
                       anti_aliased: bool, filter_2d: float):
    gstate = GaussianState(params=params, alive=alive)
    proj = project_gaussians(
        gstate.get_means(), gstate.get_scales(), gstate.get_rotations(),
        camera.world_to_camera, camera.fx, camera.fy, camera.cx, camera.cy,
        img_width, img_height, filter_2d=filter_2d)
    op = gstate.get_opacities()
    if anti_aliased:
        op = op * proj.compensations
    viewdirs = lax.stop_gradient(gstate.get_means()) - camera.camera_center
    rgbs = jnp.clip(sh_to_rgb(gstate.get_shs(), viewdirs, sh_degree) + 0.5,
                    0.0, None)
    # packed splat payload [N_local, 10]:
    # means2d(2) conic(3) opacity(1) rgb(3) depth(1); radii sent separately
    payload = jnp.concatenate([
        proj.means2d, proj.conics, op[:, None], rgbs, proj.depths[:, None],
    ], axis=-1)
    return payload, proj.radii


def make_mp_train_step(
    mesh: Mesh,
    tx,
    img_height: int,
    img_width: int,
    sh_degree: int,
    tile_size: int = 16,
    isect_capacity: int = 1 << 16,
    max_per_tile: int = 512,
    chunk: int = 64,
    anti_aliased: bool = True,
    filter_2d: float = 0.3,
    lambda_dssim: float = 0.2,
    compact_k: int = None,
    backend: str = "auto",
    fast_math: bool = True,
    with_masks: bool = False,
):
    """Build a jitted sharded full training step.

    Expects:
      params/opt_state leaves sharded P('mp') on the leading CAP dim,
      alive sharded P('mp'),
      camera batch (one camera per device) + gt images sharded P(('dp','mp')),
      bg_color replicated.
    Returns step(params, alive, opt_state, cams, gts, bg) ->
      (params, opt_state, loss, tap_grads, radii, n_overflow) with
      tap_grads/radii sharded P('mp') for density-stat accumulation and
      n_overflow the total visible splats dropped by top-K compaction this
      step (monitor and raise compact_k when > 0 — the fixed-capacity
      analogue of the reference's ragged visible-count exchange).

    `backend`: 'pallas' | 'xla' | 'auto' (pallas on TPU) — the same switch
    as TileRenderer, so multi-chip training runs the Pallas kernels
    (reference gsplat_distributed_renderer.py:372-389 rasterizes with the
    same CUDA kernels as single-GPU).
    """
    n_mp = mesh.shape["mp"]
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu")
    # off-TPU (e.g. the 8-virtual-device CPU dryrun) the Pallas kernels run
    # in interpret mode so the sharded pallas path stays exercisable
    interpret = use_pallas and jax.default_backend() != "tpu"
    from ..ops.rasterize_pallas import _resolve_capacity
    pallas_cap = _resolve_capacity(0, isect_capacity)

    def device_step(params, alive, cams, gts, masks, bg):
        # leaves here are per-device shards:
        # params.* [CAP/mp, ...]; cams leaves [1, ...]; gts [1, H, W, 3];
        # masks [1, H, W] (1 = keep; reference vanilla_metrics.py:63-67)
        my_cam = jax.tree.map(lambda x: x[0], cams)
        my_gt = gts[0]
        my_mask = masks[0] if with_masks else None
        # every mp peer's camera (this dp row renders n_mp cameras jointly)
        cams_mp = jax.tree.map(
            lambda x: lax.all_gather(x, "mp", axis=0, tiled=True), cams)

        cap_local = params.means.shape[0]
        tap0 = jnp.zeros((n_mp, cap_local, 2), jnp.float32)

        def loss_fn(p, tap):
            # project local shard for each mp camera
            def proj_one(cam_i, tap_i):
                payload, radii = _project_and_color(
                    p, alive, cam_i, img_height, img_width, sh_degree,
                    anti_aliased, filter_2d)
                payload = payload.at[:, 0:2].add(tap_i)
                return payload, radii

            payload, radii = jax.vmap(proj_one)(cams_mp, tap)
            # visible-splat compaction before the exchange: ship only the
            # top-K slots per (camera, shard), visible-first (the reference
            # exchanges exact visible counts via ragged NCCL all_to_all,
            # gsplat_distributed_renderer.py:127-217; fixed K is the
            # TPU-static equivalent — monitor overflow and raise K)
            k_eff = cap_local if compact_k is None else min(compact_k,
                                                            cap_local)
            radii_for_x = radii
            n_visible = jnp.sum((radii > 0).astype(jnp.int32), axis=1)
            overflow = jnp.sum(jnp.maximum(n_visible - k_eff, 0))
            if k_eff < cap_local:
                order = jax.lax.stop_gradient(
                    jnp.argsort(radii <= 0, axis=1, stable=True))[:, :k_eff]
                payload = jnp.take_along_axis(payload, order[..., None],
                                              axis=1)
                radii_for_x = jnp.take_along_axis(radii, order, axis=1)
            # [n_mp(cameras), K, D] -> exchange so each device gets all
            # shards' splats for ITS camera: [n_mp(shards), K, D]
            payload = lax.all_to_all(payload, "mp", split_axis=0,
                                     concat_axis=0, tiled=False)
            radii_x = lax.all_to_all(radii_for_x, "mp", split_axis=0,
                                     concat_axis=0, tiled=False)
            n_total = n_mp * k_eff
            payload = payload.reshape(n_total, payload.shape[-1])
            radii_full = radii_x.reshape(n_total)

            proj = Projections(
                means2d=payload[:, 0:2],
                depths=payload[:, 9],
                radii=radii_full,
                conics=payload[:, 2:5],
                compensations=jnp.ones((n_total,), payload.dtype),
                mask=radii_full > 0,
            )
            if use_pallas:
                isects_p = isect_encode_padded(
                    proj, img_height, img_width, tile_size, pallas_cap)
                img_nobg, alpha = rasterize_pallas(
                    proj.means2d, proj.conics, payload[:, 5],
                    payload[:, 6:9], jnp.zeros_like(proj.means2d),
                    isects_p, img_height, img_width, tile_size, 128,
                    interpret, pallas_cap, False, fast_math)
                img = img_nobg + (1.0 - alpha)[..., None] * bg[None, None]
            else:
                isects = isect_encode(proj, img_height, img_width,
                                      tile_size, isect_capacity)
                img, _ = rasterize_tiles(
                    proj.means2d, proj.conics, payload[:, 5],
                    payload[:, 6:9], isects, img_height, img_width,
                    tile_size=tile_size, max_per_tile=max_per_tile,
                    chunk=chunk, background=bg)
            loss, _ = train_loss(img, my_gt, mask_hw=my_mask,
                                 lambda_dssim=lambda_dssim)
            return lax.pmean(loss, ("dp", "mp")), (radii, overflow)

        (loss, (radii_local, overflow)), (pgrads, tap_grads) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, tap0)
        n_overflow = lax.psum(overflow, ("dp", "mp"))
        # params replicated over dp -> sum contributions of dp rows
        pgrads = lax.psum(pgrads, "dp")
        tap_grads = lax.psum(tap_grads, "dp")
        # per-camera tap grads [n_mp, N_local, 2]; total stat = sum over
        # cameras (reference DistributedVanillaDensityController sums
        # per-camera grads, distributed_vanilla_density_controller.py:24-47)
        tap_grad_sum = jnp.sum(tap_grads, axis=0)
        radii_max = jnp.max(radii_local, axis=0)
        return pgrads, loss, tap_grad_sum, radii_max, n_overflow

    from jax import shard_map

    pspec = P("mp")
    cam_spec = P(("dp", "mp"))
    grad_step = shard_map(
        device_step, mesh=mesh,
        in_specs=(pspec, pspec, cam_spec, cam_spec, cam_spec, P()),
        out_specs=(pspec, P(), pspec, pspec, P()),
        check_vma=False,
    )

    def step(params, alive, opt_state, cams, gts, masks, bg):
        pgrads, loss, tap_grad, radii, n_overflow = grad_step(
            params, alive, cams, gts, masks, bg)
        # elementwise Adam keeps the mp sharding XLA propagated from pgrads
        updates, opt_state = tx.update(pgrads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss, tap_grad, radii, n_overflow

    if not with_masks:
        base = jax.jit(step)

        def no_mask_step(params, alive, opt_state, cams, gts, bg):
            # a [n_dev, 1, 1] dummy keeps the traced shapes static; the
            # mask is statically None inside device_step
            dummy = jnp.zeros((gts.shape[0], 1, 1), jnp.float32)
            return base(params, alive, opt_state, cams, gts, dummy, bg)

        return no_mask_step
    return jax.jit(step)


def exchange_bytes_per_step(n_devices: int, n_mp: int, k_eff: int,
                            payload_dim: int = 10) -> int:
    """Bytes crossing the ICI per step in the splat exchange: every device
    ships (n_mp - 1)/n_mp of its [n_mp, K, D] payload + [n_mp, K] radii
    (the diagonal block stays local). The reference exchanges exact ragged
    visible counts (gsplat_distributed_renderer.py:127-217); here K is the
    static per-(camera, shard) budget, so bytes-on-wire is deterministic."""
    per_dev = n_mp * k_eff * (payload_dim + 1) * 4
    return n_devices * per_dev * (n_mp - 1) // n_mp


def rebalance_permutation(alive: jnp.ndarray, n_mp: int) -> jnp.ndarray:
    """Slot-compaction reshard: a permutation `perm` ([CAP] i32, use as
    `new_x = x[perm]`) that redistributes ALIVE slots round-robin across the
    n_mp equal shard segments, so every shard holds within +-1 of the mean
    alive count.

    The TPU analogue of the reference's periodic Gaussian+Adam-state
    redistribution when max/min shard ratio exceeds ~1.1
    (gsplat_distributed_renderer.py:423-510): with capacity-padded state the
    per-slot compute is already uniform, so what imbalance actually costs is
    the visible-splat compaction budget (`compact_k`) — packing alive slots
    evenly lets every shard run the same small K."""
    cap = alive.shape[0]
    S = cap // n_mp
    alive_i = alive.astype(jnp.int32)
    n_alive = jnp.sum(alive_i)
    # slot ids, alive first (stable: preserves relative order)
    order = jnp.argsort(jnp.logical_not(alive), stable=True)
    # destination layout: position p = s*S + k holds alive rank k*n_mp + s
    # while that rank exists; remaining positions take dead slots in order
    p = jnp.arange(cap, dtype=jnp.int32)
    s = p // S
    k = p % S
    alive_rank = k * n_mp + s
    is_alive_pos = alive_rank < n_alive
    dead_pos_rank = jnp.cumsum(
        jnp.logical_not(is_alive_pos).astype(jnp.int32)) - 1
    src_sorted = jnp.where(is_alive_pos, alive_rank,
                           n_alive + dead_pos_rank)
    return jnp.take(order, src_sorted, axis=0)


def apply_permutation(perm, params, alive, opt_state, density=None):
    """Permute every [CAP, ...]-leading leaf (params + Adam moments +
    density stats) with one gather. Under jit on mp-sharded arrays XLA
    lowers the cross-shard moves to collectives."""
    cap = alive.shape[0]

    def mv(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 \
                and x.shape[0] == cap:
            return jnp.take(x, perm, axis=0)
        return x

    params = jax.tree.map(mv, params)
    alive = jnp.take(alive, perm, axis=0)
    opt_state = jax.tree.map(mv, opt_state)
    if density is not None:
        density = jax.tree.map(mv, density)
    return params, alive, opt_state, density


def shard_alive_counts(alive: jnp.ndarray, n_mp: int) -> np.ndarray:
    """Per-shard alive counts [n_mp] (host-side; used for the rebalance
    trigger and the exchange-accounting log)."""
    a = np.asarray(jax.device_get(alive)).astype(np.int64)
    return a.reshape(n_mp, -1).sum(axis=1)


def shard_params(mesh: Mesh, params: GaussianParams, alive, opt_state):
    """Place params/opt_state on the mesh: CAP dim split over 'mp',
    replicated over 'dp'."""
    def put(spec):
        def f(x):
            if isinstance(x, jnp.ndarray) and x.ndim >= 1:
                return jax.device_put(x, NamedSharding(mesh, spec))
            return x
        return f

    params = jax.tree.map(put(P("mp")), params)
    alive = jax.device_put(alive, NamedSharding(mesh, P("mp")))
    opt_state = jax.tree.map(put(P("mp")), opt_state)
    return params, alive, opt_state

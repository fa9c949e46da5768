"""Distributed fit: the reference's MPStrategy training loop on a mesh.

Drives `make_mp_train_step` (camera DP x gaussian-sharded MP,
gsl_tpu/parallel/gaussian_sharded.py) through the reference training
schedule — n_devices cameras per step, densification stats accumulated
from the exchanged tap gradients, vanilla ADC on the SHARDED state
(XLA inserts the collectives; parity with single-device densify is
covered by tests/test_parallel.py), SH warmup, checkpoint + PLY export.

The reference equivalent is `main.py fit --config configs/distributed.yaml`
(MPStrategy + GSplatDistributedRenderer + DistributedVanillaDensityController,
internal/mp_strategy.py). Multi-host launch: run this under
`jax.distributed.initialize()`; the mesh spans all chips.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataparsers.dataparser import DataParserOutputs
from ..data.dataset import CachedDataset
from ..renderers.tile_renderer import viewspace_grad_scale
from ..training.density import (densify_and_prune, init_density_state,
                                reset_opacities, update_stats)
from ..training.fit import FitConfig, _round_capacity
from ..training.trainer import Trainer, TrainState
from .gaussian_sharded import make_mesh, make_mp_train_step, shard_params


def fit_distributed(trainer: Trainer, outputs: DataParserOutputs,
                    cfg: FitConfig, mesh: Optional[Mesh] = None,
                    compact_k: Optional[int] = None,
                    backend: str = "auto"):
    """Returns the final (host-gathered) TrainState."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    rng = jax.random.PRNGKey(cfg.seed)

    pc = outputs.point_cloud
    capacity = _round_capacity(
        max(int(pc.xyz.shape[0] * cfg.capacity_multiplier),
            cfg.min_capacity, n_dev * 1024))
    gaussians = trainer.model.init_from_pcd(pc.xyz, pc.rgb, capacity)
    tx = trainer.tx if hasattr(trainer, "tx") else None
    state = trainer.setup(gaussians, outputs.camera_extent,
                          outputs.prune_extent)
    tx = trainer.tx

    params, alive, opt_state = shard_params(mesh, state.params,
                                            state.alive, state.opt_state)
    dshard = NamedSharding(mesh, P("mp"))
    density = jax.tree.map(
        lambda x: jax.device_put(x, dshard), init_density_state(capacity))

    d0 = trainer.model.sh_degree
    cams = outputs.train_set.cameras
    dataset = CachedDataset(outputs.train_set)
    bg = jnp.asarray(trainer.config.background_color, jnp.float32)
    H = int(cams[0].height)
    W = int(cams[0].width)
    d_cfg = trainer.density_cfg
    gscale = viewspace_grad_scale(
        W, H, trainer.renderer_cfg.max_viewspace_grad_scale)

    steps = {}

    def step_for(sh_degree):
        if sh_degree not in steps:
            steps[sh_degree] = make_mp_train_step(
                mesh, tx, H, W, sh_degree=sh_degree,
                tile_size=trainer.renderer_cfg.tile_size,
                isect_capacity=max(
                    trainer.renderer_cfg.min_isect_capacity, capacity),
                max_per_tile=trainer.renderer_cfg.max_per_tile,
                chunk=trainer.renderer_cfg.chunk,
                compact_k=compact_k, backend=backend)
        return steps[sh_degree]

    densify_j = jax.jit(lambda k, gs, o, d, sz: densify_and_prune(
        k, gs, o, d, d_cfg, trainer.cameras_extent, trainer.prune_extent,
        sz))

    def grow_sharded(params, alive, opt_state, density, new_cap):
        """2x capacity growth on the sharded state: pad via the trainer's
        moment-carrying grow, then re-place on the mesh (same discipline as
        the single-device grow-and-redo in Trainer.maybe_density_ops)."""
        st = TrainState(params=params, alive=alive, opt_state=opt_state,
                        density=density, step=jnp.zeros((), jnp.int32))
        st = trainer.grow_state(st, new_cap)
        p, a, o = shard_params(mesh, st.params, st.alive, st.opt_state)
        d = jax.tree.map(
            lambda x: jax.device_put(x, dshard) if isinstance(
                x, jnp.ndarray) and x.ndim >= 1 else x, st.density)
        return p, a, o, d
    n_train = len(outputs.train_set)
    order = np.random.RandomState(cfg.seed).permutation(n_train)
    pos = 0
    t0 = time.time()
    from ..models.gaussian import GaussianState

    for step_i in range(1, cfg.max_steps + 1):
        idx = []
        for _ in range(n_dev):
            idx.append(int(order[pos % n_train]))
            pos += 1
        cam_batch = cams[np.asarray(idx)]
        gts = jnp.stack([jnp.asarray(dataset.get(i)[2]) for i in idx])

        sh_degree = min(d0, step_i // 1000) if d0 > 0 else 0
        mp_step = step_for(sh_degree)
        params, opt_state, loss, tap_grad, radii, n_ovf = mp_step(
            params, alive, opt_state, cam_batch, gts, bg)
        density = update_stats(density, tap_grad, radii, gscale)

        if (d_cfg.densify_from_iter < step_i < d_cfg.densify_until_iter
                and step_i % d_cfg.densification_interval == 0):
            rng, k = jax.random.split(rng)
            use_size = jnp.asarray(step_i > d_cfg.opacity_reset_interval)
            snap = (params, alive, opt_state, density)
            gstate, opt_state, density, n_trunc = densify_j(
                k, GaussianState(params=params, alive=alive),
                opt_state, density, use_size)
            params, alive = gstate.params, gstate.alive
            tries = 0
            while int(n_trunc) > 0 and tries < 3:
                # capacity exhausted: grow 2x from the pre-densify snapshot
                # and redo so truncated children are not silently dropped
                capacity *= 2
                snap = grow_sharded(*snap, capacity)
                params, alive, opt_state, density = snap
                steps.clear()  # compiled steps bake in the isect capacity
                gstate, opt_state, density, n_trunc = densify_j(
                    k, GaussianState(params=params, alive=alive),
                    opt_state, density, use_size)
                params, alive = gstate.params, gstate.alive
                tries += 1
                print(f"[fit_mp] capacity -> {capacity} at step {step_i}")
            if int(n_trunc) > 0:
                print(f"[fit_mp] densify at step {step_i} still truncating "
                      f"{int(n_trunc)} after {tries} growths")
        if (step_i < d_cfg.densify_until_iter
                and step_i % d_cfg.opacity_reset_interval == 0):
            gstate, opt_state = reset_opacities(
                GaussianState(params=params, alive=alive), opt_state,
                d_cfg.opacity_reset_value)
            params, alive = gstate.params, gstate.alive

        if step_i % cfg.log_interval == 0:
            n_alive = int(jnp.sum(alive.astype(jnp.int32)))
            print(f"[fit_mp] step {step_i} loss={float(loss):.5f} "
                  f"n={n_alive} overflow={int(n_ovf)} "
                  f"({cfg.log_interval / (time.time() - t0):.1f} it/s)")
            t0 = time.time()

    final = TrainState(
        params=jax.device_get(params), alive=jax.device_get(alive),
        opt_state=jax.device_get(opt_state),
        density=jax.device_get(density),
        step=jnp.asarray(cfg.max_steps))
    if cfg.save_ply:
        from ..utils.ply import save_state_ply
        save_state_ply(os.path.join(cfg.output_dir, "point_cloud",
                                    f"iteration_{cfg.max_steps}",
                                    "point_cloud.ply"),
                       GaussianState(params=final.params,
                                     alive=final.alive))
    return final

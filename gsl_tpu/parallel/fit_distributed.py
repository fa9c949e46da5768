"""Distributed fit: the reference's MPStrategy training loop on a mesh.

Drives `make_mp_train_step` (camera DP x gaussian-sharded MP,
gsl_tpu/parallel/gaussian_sharded.py) through the reference training
schedule — n_devices cameras per step, densification stats accumulated
from the exchanged tap gradients, vanilla ADC on the SHARDED state
(XLA inserts the collectives; parity with single-device densify is
covered by tests/test_parallel.py), SH warmup, checkpoint + PLY export.

Launchable from the CLI: `python main.py fit --config
gsl_tpu/configs/distributed.yaml` routes here (the reference equivalent is
`main.py fit --config configs/distributed.yaml` -> MPStrategy +
GSplatDistributedRenderer + DistributedVanillaDensityController,
internal/mp_strategy.py:29-129). Feature parity with the single-chip loop:

- mid-training checkpoints at `save_iterations` + auto-resume (reference
  --ckpt_path last auto-search, internal/cli.py:92-110),
- end-of-run validation through the standard `validate` loop,
- per-image masks + mixed image sizes via bucket padding (the loss masks
  padded pixels; reference vanilla_metrics.py:63-67),
- background batch prefetch (the CacheDataLoader thread analogue,
  internal/dataset.py:213),
- visible-splat compaction with an adaptive top-K budget (`compact_k`
  "auto"): probed from the scene, grown 2x whenever the exchange
  overflows — the static-shape analogue of the reference's exact ragged
  visible-count all_to_all (gsplat_distributed_renderer.py:127-217),
- periodic load re-balancing: when max/min per-shard alive ratio exceeds
  `rebalance_ratio`, alive slots are re-packed round-robin across shards
  (Adam moments + density stats ride the same permutation) — the analogue
  of the reference's random redistribution incl. optimizer state
  (gsplat_distributed_renderer.py:423-510),
- exchange accounting: per-log bytes-on-wire, per-shard alive counts and
  the overflow counter, written to `mp_log.csv`.

Multi-host launch: run this under `jax.distributed.initialize()`
(scripts/launch_multihost.py); the mesh spans all chips.
"""
from __future__ import annotations

import csv
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataparsers.dataparser import DataParserOutputs
from ..data.dataset import CachedDataset
from ..models.gaussian import GaussianState
from ..renderers.tile_renderer import viewspace_grad_scale
from ..training.density import (densify_and_prune, init_density_state,
                                reset_opacities, update_stats)
from ..training.fit import FitConfig, _round_capacity, validate
from ..training.trainer import Trainer, TrainState
from ..utils.checkpoint import (find_latest_checkpoint, load_checkpoint,
                                load_checkpoint_meta, save_checkpoint)
from .gaussian_sharded import (apply_permutation, exchange_bytes_per_step,
                               make_mesh, make_mp_train_step,
                               rebalance_permutation, shard_alive_counts,
                               shard_params)


def _round512(n: int) -> int:
    return max(512, -(-int(n) // 512) * 512)


class _BatchPrefetcher:
    """One-batch-lookahead loader thread: assembles the next step's
    (camera batch, padded GT stack, mask stack) while the device computes
    (the CacheDataLoader background-caching analogue,
    reference internal/dataset.py:213)."""

    def __init__(self, dataset, cams, order, n_dev, Hp, Wp, start_pos=0):
        self.dataset = dataset
        self.cams = cams
        self.order = order
        self.n_dev = n_dev
        self.Hp, self.Wp = Hp, Wp
        self.pos = start_pos
        self.q = queue.Queue(maxsize=2)
        self.stop = threading.Event()
        self.t = threading.Thread(target=self._worker, daemon=True)
        self.t.start()

    def _build(self):
        n_train = len(self.order)
        idx = [int(self.order[(self.pos + j) % n_train])
               for j in range(self.n_dev)]
        self.pos += self.n_dev
        gts = np.zeros((self.n_dev, self.Hp, self.Wp, 3), np.float32)
        masks = np.zeros((self.n_dev, self.Hp, self.Wp), np.float32)
        for j, i in enumerate(idx):
            _, _, img, img_mask = self.dataset.get(i)
            h, w = img.shape[:2]
            gts[j, :h, :w] = img
            masks[j, :h, :w] = 1.0 if img_mask is None else img_mask
        cam_batch = self.cams[np.asarray(idx)]
        return cam_batch, gts, masks

    def _worker(self):
        while not self.stop.is_set():
            item = self._build()
            while not self.stop.is_set():
                try:
                    self.q.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self):
        return self.q.get()

    def close(self):
        self.stop.set()
        try:
            self.q.get_nowait()
        except queue.Empty:
            pass


def fit_distributed(trainer: Trainer, outputs: DataParserOutputs,
                    cfg: FitConfig, mesh: Optional[Mesh] = None,
                    compact_k="auto", backend: str = "auto",
                    rebalance_ratio: float = 1.1,
                    val_at_end: bool = True):
    """Returns (final host-gathered TrainState, validate results or None)."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n_mp = mesh.shape["mp"]
    rng = jax.random.PRNGKey(cfg.seed)

    pc = outputs.point_cloud
    capacity = _round_capacity(
        max(int(pc.xyz.shape[0] * cfg.capacity_multiplier),
            cfg.min_capacity, n_dev * 1024))
    gaussians = trainer.model.init_from_pcd(pc.xyz, pc.rgb, capacity)
    state = trainer.setup(gaussians, outputs.camera_extent,
                          outputs.prune_extent)
    tx = trainer.tx

    # ---- mid-training resume (host-side, then shard) ----
    start_step = 1
    resume_path = None
    if cfg.resume == "auto":
        resume_path = find_latest_checkpoint(
            os.path.join(cfg.output_dir, "checkpoints"))
    elif cfg.resume not in ("never", "", None):
        resume_path = cfg.resume
    saved_compact_k = None
    if resume_path is not None:
        meta = load_checkpoint_meta(resume_path)
        stored_cap = (meta or {}).get("capacity", capacity)
        if stored_cap != capacity:
            state = trainer.grow_state(state, stored_cap)
            capacity = stored_cap
        state = load_checkpoint(resume_path, state)
        start_step = int(state.step) + 1
        if meta is not None:
            rng = jnp.asarray(np.asarray(meta["rng"], np.uint32))
            saved_compact_k = meta.get("compact_k")
        print(f"[fit_mp] resumed {resume_path} -> continuing at "
              f"{start_step}")

    params, alive, opt_state = shard_params(mesh, state.params,
                                            state.alive, state.opt_state)
    dshard = NamedSharding(mesh, P("mp"))
    density = jax.tree.map(
        lambda x: jax.device_put(x, dshard),
        state.density if state.density is not None
        else init_density_state(capacity))

    d0 = trainer.model.sh_degree
    cams = outputs.train_set.cameras
    dataset = CachedDataset(outputs.train_set,
                            background=np.asarray(
                                trainer.config.background_color, np.float32))
    bg = jnp.asarray(trainer.config.background_color, jnp.float32)

    # mixed image sizes: pad every GT to the bucketed max (one compiled
    # step for the whole dataset); the mask zeroes the padding in the loss
    b = max(cfg.size_bucket, 1)
    heights = [int(cams[i].height) for i in range(len(outputs.train_set))]
    widths = [int(cams[i].width) for i in range(len(outputs.train_set))]
    H = -(-max(heights) // b) * b
    W = -(-max(widths) // b) * b
    uniform = (min(heights) == max(heights) == H
               and min(widths) == max(widths) == W)
    has_masks = getattr(outputs.train_set, "mask_paths", None) is not None
    with_masks = (not uniform) or has_masks

    d_cfg = trainer.density_cfg
    gscale = viewspace_grad_scale(
        W, H, trainer.renderer_cfg.max_viewspace_grad_scale)

    # ---- adaptive visible-splat compaction budget ----
    def probe_k():
        """Max per-(camera, shard) visible count over the first n_dev
        cameras -> initial top-K budget (x1.3, 512-aligned)."""
        from ..ops.projection import project_gaussians
        gstate = GaussianState(params=jax.device_get(state.params),
                               alive=jax.device_get(state.alive))
        sub = cams[np.arange(min(n_dev, len(outputs.train_set)))]

        @jax.jit
        def counts(ms, ss, qs, cam_b):
            def one(cam):
                proj = project_gaussians(
                    ms, ss, qs, cam.world_to_camera, cam.fx, cam.fy,
                    cam.cx, cam.cy, W, H,
                    filter_2d=trainer.renderer_cfg.filter_2d_kernel_size)
                vis = (proj.radii > 0).astype(jnp.int32)
                return jnp.max(jnp.sum(vis.reshape(n_mp, -1), axis=1))
            return jnp.max(jax.vmap(one)(cam_b))

        return int(counts(gstate.get_means(), gstate.get_scales(),
                          gstate.get_rotations(), sub))

    cap_local = capacity // n_mp
    if compact_k == "auto":
        if saved_compact_k is not None:
            k_eff = min(int(saved_compact_k), cap_local)
        else:
            k_eff = min(_round512(1.3 * max(probe_k(), 1)), cap_local)
        adaptive = True
    elif compact_k is None:
        k_eff = cap_local
        adaptive = False
    else:
        k_eff = min(int(compact_k), cap_local)
        adaptive = False
    print(f"[fit_mp] mesh={dict(mesh.shape)} capacity={capacity} "
          f"compact_k={k_eff} ({'auto' if adaptive else 'fixed'})")

    steps = {}

    def step_for(sh_degree):
        key = (sh_degree, k_eff, capacity)
        if key not in steps:
            steps.clear()  # stale capacities/budgets never come back
            steps[key] = make_mp_train_step(
                mesh, tx, H, W, sh_degree=sh_degree,
                tile_size=trainer.renderer_cfg.tile_size,
                isect_capacity=max(
                    trainer.renderer_cfg.min_isect_capacity, capacity),
                max_per_tile=trainer.renderer_cfg.max_per_tile,
                chunk=trainer.renderer_cfg.chunk,
                compact_k=(None if k_eff >= cap_local else k_eff),
                backend=backend, with_masks=with_masks)
        return steps[key]

    densify_j = jax.jit(lambda k, gs, o, d, sz: densify_and_prune(
        k, gs, o, d, d_cfg, trainer.cameras_extent, trainer.prune_extent,
        sz))
    rebalance_j = jax.jit(
        lambda p, a, o, d: apply_permutation(
            rebalance_permutation(a, n_mp), p, a, o, d))

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
    loader = _BatchPrefetcher(dataset, cams, order, n_dev, H, W,
                              start_pos=(start_step - 1) * n_dev)

    def host_state(step_i):
        return TrainState(
            params=jax.device_get(params), alive=jax.device_get(alive),
            opt_state=jax.device_get(opt_state),
            density=jax.device_get(density),
            step=jnp.asarray(step_i, jnp.int32))

    def save_at(step_i):
        save_checkpoint(
            os.path.join(cfg.output_dir, "checkpoints"), host_state(step_i),
            step_i, meta={"capacity": int(capacity),
                          "rng": np.asarray(rng).tolist(),
                          "compact_k": int(k_eff),
                          "mesh": dict(mesh.shape)})

    mp_log_path = os.path.join(cfg.output_dir, "mp_log.csv")
    mp_log_f = open(mp_log_path, "a" if start_step > 1 else "w",
                    newline="")
    mp_log = csv.writer(mp_log_f)
    if start_step == 1:
        mp_log.writerow(["step", "loss", "n_alive", "shard_min",
                         "shard_max", "compact_k", "exchange_bytes",
                         "overflow", "it_per_s"])

    t0 = time.time()
    n_ovf_total = 0
    try:
        for step_i in range(start_step, cfg.max_steps + 1):
            cam_batch, gts_np, masks_np = loader.next()
            gts = jnp.asarray(gts_np)
            masks = jnp.asarray(masks_np)

            sh_degree = min(d0, step_i // 1000) if d0 > 0 else 0
            mp_step = step_for(sh_degree)
            if with_masks:
                params, opt_state, loss, tap_grad, radii, n_ovf = mp_step(
                    params, alive, opt_state, cam_batch, gts, masks, bg)
            else:
                params, opt_state, loss, tap_grad, radii, n_ovf = mp_step(
                    params, alive, opt_state, cam_batch, gts, bg)
            density = update_stats(density, tap_grad, radii, gscale)

            if adaptive and step_i % 10 == 0 and int(n_ovf) > 0:
                # exchange overflowed: double the top-K budget (recompile);
                # the ragged-NCCL reference never drops splats, so neither
                # do we for long
                n_ovf_total += int(n_ovf)
                k_eff = min(_round512(k_eff * 2), cap_local)
                print(f"[fit_mp] exchange overflow ({int(n_ovf)}) -> "
                      f"compact_k {k_eff}")

            if (d_cfg.densify_from_iter < step_i < d_cfg.densify_until_iter
                    and step_i % d_cfg.densification_interval == 0):
                rng, k = jax.random.split(rng)
                use_size = jnp.asarray(
                    step_i > d_cfg.opacity_reset_interval)
                snap = (params, alive, opt_state, density)
                gstate, opt_state, density, n_trunc = densify_j(
                    k, GaussianState(params=params, alive=alive),
                    opt_state, density, use_size)
                params, alive = gstate.params, gstate.alive
                tries = 0
                while int(n_trunc) > 0 and tries < 3:
                    # capacity exhausted: grow 2x from the pre-densify
                    # snapshot and redo so truncated children are not
                    # silently dropped
                    capacity *= 2
                    cap_local = capacity // n_mp
                    snap = grow_sharded(*snap, capacity)
                    params, alive, opt_state, density = snap
                    gstate, opt_state, density, n_trunc = densify_j(
                        k, GaussianState(params=params, alive=alive),
                        opt_state, density, use_size)
                    params, alive = gstate.params, gstate.alive
                    tries += 1
                    print(f"[fit_mp] capacity -> {capacity} at step "
                          f"{step_i}")
                if int(n_trunc) > 0:
                    print(f"[fit_mp] densify at step {step_i} still "
                          f"truncating {int(n_trunc)} after {tries} "
                          f"growths")

                # load re-balance check (reference redistributes Gaussians
                # + Adam state when max/min > 1.1,
                # gsplat_distributed_renderer.py:423-510)
                counts = shard_alive_counts(alive, n_mp)
                if counts.max() > rebalance_ratio * max(counts.min(), 1):
                    params, alive, opt_state, density = rebalance_j(
                        params, alive, opt_state, density)
                    new_counts = shard_alive_counts(alive, n_mp)
                    print(f"[fit_mp] rebalanced shards "
                          f"{counts.tolist()} -> {new_counts.tolist()}")

            if (step_i < d_cfg.densify_until_iter
                    and step_i % d_cfg.opacity_reset_interval == 0):
                gstate, opt_state = reset_opacities(
                    GaussianState(params=params, alive=alive), opt_state,
                    d_cfg.opacity_reset_value)
                params, alive = gstate.params, gstate.alive

            if step_i in cfg.save_iterations:
                save_at(step_i)

            if step_i % cfg.log_interval == 0:
                counts = shard_alive_counts(alive, n_mp)
                xbytes = exchange_bytes_per_step(n_dev, n_mp, k_eff)
                it_s = cfg.log_interval / (time.time() - t0)
                print(f"[fit_mp] step {step_i} loss={float(loss):.5f} "
                      f"n={int(counts.sum())} shards=[{counts.min()},"
                      f"{counts.max()}] K={k_eff} "
                      f"xchg={xbytes / 1e6:.2f}MB/step "
                      f"overflow={int(n_ovf)} ({it_s:.1f} it/s)")
                mp_log.writerow([step_i, float(loss), int(counts.sum()),
                                 int(counts.min()), int(counts.max()),
                                 k_eff, xbytes, int(n_ovf),
                                 round(it_s, 2)])
                mp_log_f.flush()
                t0 = time.time()
    finally:
        loader.close()
        mp_log_f.close()

    final = host_state(cfg.max_steps)
    if cfg.max_steps not in cfg.save_iterations \
            and start_step <= cfg.max_steps:
        save_at(cfg.max_steps)
    if cfg.save_ply:
        from ..utils.ply import save_state_ply
        save_state_ply(os.path.join(cfg.output_dir, "point_cloud",
                                    f"iteration_{cfg.max_steps}",
                                    "point_cloud.ply"),
                       GaussianState(params=final.params,
                                     alive=final.alive))
    results = None
    if val_at_end and outputs.val_set is not None \
            and len(outputs.val_set) > 0:
        # end-of-run validation through the standard single-device loop on
        # the gathered state (reference ValidateOnTrainEnd callback)
        results = validate(trainer, final, outputs, cfg)
        print(f"[fit_mp] val: psnr={results['psnr']:.3f} "
              f"ssim={results['ssim']:.4f}")
    return final, results

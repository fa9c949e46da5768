"""MCMC density control (3DGS-as-MCMC) as pure-functional jitted updates.

Parity with the reference MCMCDensityController
(/root/reference/internal/density_controllers/mcmc_density_controller.py:21-236)
and its `gsplat.relocation.compute_relocation` CUDA kernel:

- every 100 steps in (500, 25000): dead (opacity <= 0.005) gaussians are
  relocated onto alive ones sampled proportionally to opacity; then the
  population grows 5% (up to cap_max) the same way,
- relocation correction: o_new = 1 - (1 - o_old)^(1/N);
  s_new = s_old * o_old / denom(N, o_new). The CUDA kernel's double binomial
  sum collapses via the hockey-stick identity to
    denom(N, o) = sum_{k=0}^{N-1} (-1)^k / sqrt(k+1) * C(N, k+1) * o^(k+1),
  which vectorizes as an [n, N_max] masked sum — no kernel needed,
- after every optimizer step, means get covariance-shaped noise
  Sigma @ eps * sigmoid(-100*(op - 0.995)) * noise_lr * current_means_lr
  (mcmc_density_controller.py:95-120),
- loss adds 0.01*mean|opacity| + 0.01*mean|scale| (mcmc_metrics.py:28-66),
  see metrics usage in the trainer.

TPU-shape: multinomial = jax.random.categorical; frequency counts =
segment_sum; dead slots are rewritten in place and growth fills free
capacity slots (shape-static).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..models.gaussian import GaussianState, inverse_sigmoid
from ..ops.transforms import build_cov3d, normalize_quat
from .optimizers import zero_opt_state_rows

N_MAX = 51


@dataclasses.dataclass
class MCMCDensityControllerConfig:
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    densify_from_iter: int = 500
    densify_until_iter: int = 25_000
    densification_interval: int = 100
    min_opacity: float = 0.005
    grow_factor: float = 1.05

    def instantiate(self):
        return self


def _binom_table() -> jnp.ndarray:
    """C(N, k+1) for N in [0, N_MAX], k in [0, N_MAX-1]."""
    t = [[math.comb(n, k + 1) for k in range(N_MAX)]
         for n in range(N_MAX + 1)]
    return jnp.asarray(t, jnp.float32)


_BINOMS = None


def relocation_correction(o_old: jnp.ndarray, s_old: jnp.ndarray,
                          n: jnp.ndarray):
    """o_old [m], s_old [m, 3], n [m] int (clamped to N_MAX).
    Returns (o_new [m], s_new [m, 3])."""
    global _BINOMS
    if _BINOMS is None:
        _BINOMS = _binom_table()
    n = jnp.clip(n, 1, N_MAX)
    nf = n.astype(jnp.float32)
    o_new = 1.0 - jnp.power(jnp.maximum(1.0 - o_old, 1e-12), 1.0 / nf)

    k = jnp.arange(N_MAX, dtype=jnp.float32)          # [K]
    sign = jnp.power(-1.0, k)
    inv_sqrt = 1.0 / jnp.sqrt(k + 1.0)
    powers = jnp.power(o_new[:, None], k[None, :] + 1.0)   # [m, K]
    cnk = _BINOMS[n]                                   # [m, K] = C(N, k+1)
    denom = jnp.sum(sign[None, :] * inv_sqrt[None, :] * cnk * powers,
                    axis=-1)
    coeff = o_old / jnp.maximum(denom, 1e-12)
    return o_new, s_old * coeff[:, None]


def _sample_targets(key, probs, cap):
    """categorical draws [cap] proportional to probs (0 for invalid)."""
    logits = jnp.where(probs > 0.0, jnp.log(jnp.maximum(probs, 1e-20)),
                       -jnp.inf)
    return jax.random.categorical(key, logits, shape=(cap,))


def _apply_relocation(params, dest_slots, dest_valid, targets_of_dest,
                      counts, cap):
    """Write relocated copies: dest slot <- target's props with corrected
    opacity/scale; targets also get the corrected values."""
    op_act = jax.nn.sigmoid(params.opacities[:, 0])
    s_act = jnp.exp(params.scales)
    n_per_target = counts + 1
    o_new_all, s_new_all = relocation_correction(op_act, s_act, n_per_target)
    o_new_raw = inverse_sigmoid(
        jnp.clip(o_new_all, 0.005, 1.0 - 1e-7))[:, None]
    s_new_raw = jnp.log(jnp.maximum(s_new_all, 1e-12))

    tgt = jnp.minimum(targets_of_dest, cap - 1)
    dest = jnp.where(dest_valid, dest_slots, cap)

    copied = jax.tree.map(lambda arr: arr[tgt], params)
    copied = copied.replace(opacities=o_new_raw[tgt], scales=s_new_raw[tgt])
    new_params = jax.tree.map(
        lambda dst, val: dst.at[dest].set(val, mode="drop"), params, copied)
    # sampled targets get the corrected opacity/scale too
    was_target = counts > 0
    new_params = new_params.replace(
        opacities=jnp.where(was_target[:, None], o_new_raw,
                            new_params.opacities),
        scales=jnp.where(was_target[:, None], s_new_raw, new_params.scales),
    )
    touched = jnp.zeros((cap,), bool).at[dest].set(True, mode="drop")
    touched = touched | was_target
    return new_params, touched


def mcmc_densify(
    key: jax.Array,
    gstate: GaussianState,
    opt_state: Any,
    cfg: MCMCDensityControllerConfig,
) -> Tuple[GaussianState, Any, jnp.ndarray]:
    """Relocate dead + grow 5%. Returns (state, opt_state, n_added)."""
    cap = gstate.capacity
    k1, k2 = jax.random.split(key)
    p = gstate.params
    alive = gstate.alive
    slot = jnp.arange(cap, dtype=jnp.int32)

    # ---- phase 1: relocate dead onto alive ----
    op_act = jax.nn.sigmoid(p.opacities[:, 0]) * alive
    dead = alive & (op_act <= cfg.min_opacity)
    alive_ok = alive & ~dead
    probs = jnp.where(alive_ok, op_act, 0.0)
    draws = _sample_targets(k1, probs, cap)            # [cap]

    n_dead = jnp.sum(dead.astype(jnp.int32))
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1  # rank among dead
    # dead slot d uses draw[rank_d]
    tgt_of_dead = draws[jnp.clip(dead_rank, 0, cap - 1)]
    used1 = slot < n_dead
    counts1 = jax.ops.segment_sum(used1.astype(jnp.int32), draws,
                                  num_segments=cap)
    params1, touched1 = _apply_relocation(
        p, dest_slots=slot, dest_valid=dead,
        targets_of_dest=tgt_of_dead, counts=counts1, cap=cap)

    # ---- phase 2: grow 5% into free slots ----
    n_alive = jnp.sum(alive.astype(jnp.int32))
    target_num = jnp.minimum(cfg.cap_max,
                             (cfg.grow_factor * n_alive).astype(jnp.int32))
    free_slots = jnp.argsort(alive)                    # dead-capacity first
    n_free = cap - n_alive
    n_new = jnp.clip(target_num - n_alive, 0, n_free)

    op2 = jax.nn.sigmoid(params1.opacities[:, 0]) * alive
    draws2 = _sample_targets(k2, jnp.where(alive, op2, 0.0), cap)
    used2 = slot < n_new
    counts2 = jax.ops.segment_sum(used2.astype(jnp.int32), draws2,
                                  num_segments=cap)
    new_slot_valid = used2
    params2, touched2 = _apply_relocation(
        params1, dest_slots=free_slots[slot], dest_valid=new_slot_valid,
        targets_of_dest=draws2, counts=counts2, cap=cap)
    new_alive = alive.at[jnp.where(new_slot_valid, free_slots[slot],
                                   cap)].set(True, mode="drop")

    opt_state = zero_opt_state_rows(opt_state, touched1 | touched2, cap)
    return (GaussianState(params=params2, alive=new_alive,
                          extra=gstate.extra),
            opt_state, n_new)


def mcmc_noise_step(key: jax.Array, gstate: GaussianState,
                    means_lr: jnp.ndarray, noise_lr: float = 5e5
                    ) -> GaussianState:
    """Post-step position noise: means += Sigma @ eps * sigmoid(-100*
    (op - 0.995)) * noise_lr * lr."""
    p = gstate.params
    op = jax.nn.sigmoid(p.opacities[:, 0])
    gate = jax.nn.sigmoid(-100.0 * (op - 0.995))
    eps = jax.random.normal(key, p.means.shape, p.means.dtype)
    cov = build_cov3d(jnp.exp(p.scales), normalize_quat(p.rotations))
    noise = jnp.einsum("nij,nj->ni", cov, eps)
    noise = noise * (gate * noise_lr * means_lr)[:, None]
    noise = jnp.where(gstate.alive[:, None], noise, 0.0)
    return GaussianState(params=p.replace(means=p.means + noise),
                         alive=gstate.alive, extra=gstate.extra)

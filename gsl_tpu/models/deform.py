"""Deformable 3DGS: time-conditioned deformation field over a canonical
Gaussian set.

Parity with the reference deformable models
(/root/reference/internal/models/deform_model.py:41,
 vanilla_deform_model.py; renderers/deformable_renderer.py): an MLP
D(PE(xyz), PE(t)) -> (d_xyz, d_rotation, d_scaling) applied before
projection; no deformation during the warm-up steps; annealed smooth
temporal noise (AST) added to t during training.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .appearance import positional_encoding


@dataclasses.dataclass
class DeformModelConfig:
    n_neurons: int = 256
    n_layers: int = 8
    skip_layers: Tuple[int, ...] = (4,)
    xyz_frequencies: int = 10
    time_frequencies: int = 6
    warm_up: int = 3000
    lr_init: float = 8e-4
    lr_final_factor: float = 0.002
    max_steps: int = 40_000
    ast_noise_scale: float = 0.1     # annealed smooth temporal noise

    def instantiate(self):
        return self


class DeformNetwork(nn.Module):
    config: DeformModelConfig

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, t: jnp.ndarray):
        """xyz [N, 3], t scalar -> (d_xyz [N,3], d_rot [N,4], d_scale [N,3])."""
        cfg = self.config
        pe_x = positional_encoding(xyz, cfg.xyz_frequencies)
        tt = jnp.broadcast_to(jnp.reshape(t, (1, 1)), (xyz.shape[0], 1))
        pe_t = positional_encoding(tt, cfg.time_frequencies)
        inp = jnp.concatenate([pe_x, pe_t], axis=-1)
        x = inp
        for i in range(cfg.n_layers):
            if i in cfg.skip_layers:
                x = jnp.concatenate([x, inp], axis=-1)
            x = nn.relu(nn.Dense(cfg.n_neurons)(x))
        d_xyz = nn.Dense(3, kernel_init=nn.initializers.zeros)(x)
        d_rot = nn.Dense(4, kernel_init=nn.initializers.zeros)(x)
        d_scale = nn.Dense(3, kernel_init=nn.initializers.zeros)(x)
        return d_xyz, d_rot, d_scale


def deform_gaussians(net: DeformNetwork, net_params, gstate, t,
                     warm_up_active: bool = False):
    """Returns deformed (means, rotations_raw, scales_raw). Canonical xyz is
    stop-gradient into the network input (reference detaches xyz)."""
    p = gstate.params
    if warm_up_active:
        return p.means, p.rotations, p.scales
    d_xyz, d_rot, d_scale = net.apply(
        net_params, jax.lax.stop_gradient(p.means), t)
    mask = gstate.alive[:, None]
    return (p.means + d_xyz * mask,
            p.rotations + d_rot * mask,
            p.scales + d_scale * mask)


def ast_noise(key, t, step, max_steps, scale: float = 0.1):
    """Annealed smooth temporal noise on t (deformable-3dgs trick)."""
    anneal = 1.0 - jnp.clip(step / max_steps, 0.0, 1.0)
    return t + jax.random.normal(key, ()) * scale * anneal

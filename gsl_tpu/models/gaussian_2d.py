"""2D Gaussian (surfel) model: 2-dim scales + random initial rotations.

Parity with /root/reference/internal/models/gaussian_2d.py:15-40 (the random
initial rotations are "key to a quality comparable to
hbb1/2d-gaussian-splatting").
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import GaussianState, VanillaGaussianConfig


@dataclasses.dataclass
class Gaussian2DConfig(VanillaGaussianConfig):
    rotation_seed: int = 17

    def init_from_pcd(self, xyz: np.ndarray, rgb: np.ndarray,
                      capacity: int) -> GaussianState:
        state = super().init_from_pcd(xyz, rgb, capacity)
        n = xyz.shape[0]
        rng = np.random.RandomState(self.rotation_seed)
        rand_rot = jnp.asarray(
            rng.uniform(0.0, 1.0, size=(capacity, 4)).astype(np.float32))
        params = state.params.replace(
            scales=state.params.scales[:, :2],
            rotations=state.params.rotations.at[:n].set(rand_rot[:n]),
        )
        return GaussianState(params=params, alive=state.alive,
                             extra=state.extra)

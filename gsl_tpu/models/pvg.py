"""Periodic Vibration Gaussians (PVG) — dynamic scenes.

Parity with the reference PVG model + renderer
(/root/reference/internal/models/periodic_vibration_gaussian.py,
 internal/renderers/periodic_vibration_gaussian_renderer.py): each gaussian
gains a life peak tau (t_centers), a lifespan beta (t_scales, log-space) and
a velocity; at query time t:

  means(t)   = means + v * sin(2*pi*(t - tau)/T) * T/(2*pi)
  opacity(t) = opacity * exp(-0.5 * (t - tau)^2 / beta^2)

with vibration cycle T. Static gaussians emerge as beta -> inf, v -> 0.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Cameras
from ..models.gaussian import GaussianState, VanillaGaussianConfig
from ..renderers.tile_renderer import TileRenderer, TileRendererConfig


@dataclasses.dataclass
class PVGConfig(VanillaGaussianConfig):
    cycle_length: float = 0.2
    initial_t_scale: float = 1.0   # large lifespan ~= static at init
    pvg_lr: float = 1e-3

    def init_from_pcd(self, xyz: np.ndarray, rgb: np.ndarray,
                      capacity: int) -> GaussianState:
        state = super().init_from_pcd(xyz, rgb, capacity)
        n = xyz.shape[0]
        rng = np.random.RandomState(3)
        t0 = np.zeros((capacity, 1), np.float32)
        t0[:n, 0] = rng.uniform(0, 1, n)
        params = state.params.replace(
            t_centers=jnp.asarray(t0),
            t_scales=jnp.full((capacity, 1),
                              np.log(self.initial_t_scale), jnp.float32),
            velocities=jnp.zeros((capacity, 3), jnp.float32),
        )
        return GaussianState(params=params, alive=state.alive,
                             extra=state.extra)


def pvg_modulate(gstate: GaussianState, t, cycle_length: float):
    """-> (means_t [CAP, 3], temporal opacity factor [CAP])."""
    p = gstate.params
    tau = p.t_centers[:, 0]
    beta = jnp.exp(p.t_scales[:, 0])
    phase = 2.0 * jnp.pi * (t - tau) / cycle_length
    amp = cycle_length / (2.0 * jnp.pi)
    means_t = p.means + p.velocities * (jnp.sin(phase) * amp)[:, None]
    rho = jnp.exp(-0.5 * ((t - tau) / jnp.maximum(beta, 1e-6)) ** 2)
    return means_t, rho


@dataclasses.dataclass
class PVGRendererConfig(TileRendererConfig):
    cycle_length: float = 0.2

    def instantiate(self) -> "PVGRenderer":
        return PVGRenderer(self)


class PVGRenderer(TileRenderer):
    def get_means(self, gaussians: GaussianState, camera: Cameras):
        means_t, _ = pvg_modulate(gaussians, camera.time,
                                  self.config.cycle_length)
        return means_t

    def get_opacities(self, gaussians, camera, proj):
        _, rho = pvg_modulate(gaussians, camera.time,
                              self.config.cycle_length)
        op = gaussians.get_opacities() * rho
        if self.config.anti_aliased:
            op = op * proj.compensations
        return op

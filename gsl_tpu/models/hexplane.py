"""HexPlane spatio-temporal deformation field (4DGS).

Parity with the reference 4DGS components
(/root/reference/internal/model_components/gs4d_deformation.py,
 gs4d_grid.py, gs4d_hexplane.py — HexPlane field backing the 4DGS viewer
path): six multiplied 2D feature planes over (x,y) (x,z) (y,z) (x,t) (y,t)
(z,t) at multiple resolutions, bilinear sampling, concatenated across
resolutions, decoded by small MLP heads into (d_xyz, d_rotation, d_scaling).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_PLANES = list(itertools.combinations(range(4), 2))  # 6 coordinate pairs


def _bilinear(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """grid [Rh, Rw, F], uv [N, 2] in [0, 1] -> [N, F]."""
    H, W, F = grid.shape
    x = jnp.clip(uv[:, 0] * (W - 1), 0.0, W - 1.0)
    y = jnp.clip(uv[:, 1] * (H - 1), 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    return (grid[y0, x0] * (1 - fx) * (1 - fy)
            + grid[y0, x1] * fx * (1 - fy)
            + grid[y1, x0] * (1 - fx) * fy
            + grid[y1, x1] * fx * fy)


class HexPlaneField(nn.Module):
    """Multiplied 6-plane field: features(x, y, z, t) -> [N, F * n_res]."""

    resolutions: Sequence[int] = (32, 64)
    time_resolution: int = 16
    n_features: int = 16
    bounds: float = 1.5

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        p = jnp.clip(xyz / self.bounds * 0.5 + 0.5, 0.0, 1.0)   # [N, 3]
        tt = jnp.broadcast_to(jnp.reshape(t, (1,)), (xyz.shape[0],))
        coords = jnp.concatenate([p, tt[:, None]], axis=-1)     # [N, 4]

        outs = []
        for r in self.resolutions:
            feat = jnp.ones((xyz.shape[0], self.n_features))
            for pi, (a, b) in enumerate(_PLANES):
                is_time = 3 in (a, b)
                res_a = self.time_resolution if a == 3 else r
                res_b = self.time_resolution if b == 3 else r
                init = (nn.initializers.ones if is_time
                        else nn.initializers.uniform(0.2))
                grid = self.param(f"plane_r{r}_p{pi}", init,
                                  (res_b, res_a, self.n_features))
                feat = feat * _bilinear(grid,
                                        coords[:, (a, b)])
            outs.append(feat)
        return jnp.concatenate(outs, axis=-1)


class HexPlaneDeformation(nn.Module):
    """HexPlane features -> (d_xyz, d_rot, d_scale) heads (zero-init)."""

    resolutions: Sequence[int] = (32, 64)
    n_features: int = 16
    n_neurons: int = 64

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, t: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        feats = HexPlaneField(resolutions=self.resolutions,
                              n_features=self.n_features)(xyz, t)
        h = nn.relu(nn.Dense(self.n_neurons)(feats))
        h = nn.relu(nn.Dense(self.n_neurons)(h))
        d_xyz = nn.Dense(3, kernel_init=nn.initializers.zeros)(h)
        d_rot = nn.Dense(4, kernel_init=nn.initializers.zeros)(h)
        d_scale = nn.Dense(3, kernel_init=nn.initializers.zeros)(h)
        return d_xyz, d_rot, d_scale

"""Input encodings: multi-level dense 2D grids (tiny-cuda-nn analogue).

The reference's tcnn `DenseGrid` encoding
(/root/reference/internal/renderers/gsplat_appearance_embedding_visibility_map_renderer.py:115-125
and internal/utils/network_factory.py) maps to plain Flax parameters +
bilinear gathers — XLA fuses the interpolation; there is nothing for a
custom kernel to win at these sizes.
"""
from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class DenseGrid2DEncoding(nn.Module):
    """Multi-level learned 2D feature grids with bilinear interpolation.

    uv in [0, 1]^2 -> concat over levels of interpolated features
    ([..., n_levels * n_features]). `n_instances` > 1 keeps one grid set
    per image (the Ha-NeRF-style per-image transient grids)."""

    n_levels: int = 4
    base_resolution: int = 16
    per_level_scale: float = 2.0
    n_features: int = 2
    n_instances: int = 1

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features

    @nn.compact
    def __call__(self, uv: jnp.ndarray, instance=0) -> jnp.ndarray:
        outs = []
        for lv in range(self.n_levels):
            res = int(round(self.base_resolution
                            * self.per_level_scale ** lv))
            grid = self.param(
                f"grid_{lv}",
                nn.initializers.uniform(scale=1e-4),
                (self.n_instances, res, res, self.n_features))
            g = grid[instance]
            x = jnp.clip(uv[..., 0], 0.0, 1.0) * (res - 1)
            y = jnp.clip(uv[..., 1], 0.0, 1.0) * (res - 1)
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 2)
            fx = (x - x0)[..., None]
            fy = (y - y0)[..., None]
            v00 = g[y0, x0]
            v01 = g[y0, x0 + 1]
            v10 = g[y0 + 1, x0]
            v11 = g[y0 + 1, x0 + 1]
            outs.append(v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                        + v10 * (1 - fx) * fy + v11 * fx * fy)
        return jnp.concatenate(outs, axis=-1)


class SkipMLP(nn.Module):
    """ReLU MLP with optional skip connections + output activation — the
    network_factory.get_network_with_skip_layers analogue
    (/root/reference/internal/utils/network_factory.py:54-143)."""

    n_output_dims: int
    n_layers: int = 3
    n_neurons: int = 64
    skips: List[int] = dataclasses.field(default_factory=list)
    output_activation: str = "sigmoid"   # "sigmoid" | "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        for i in range(self.n_layers - 1):
            if i in self.skips:
                x = jnp.concatenate([x, inp], axis=-1)
            x = nn.relu(nn.Dense(self.n_neurons)(x))
        x = nn.Dense(self.n_output_dims)(x)
        if self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x

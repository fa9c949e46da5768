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


def _hash_level_resolutions(n_levels: int, base_resolution: int,
                            max_resolution: int) -> List[int]:
    """tcnn growth rule: exp-spaced from base to max resolution
    (/root/reference/internal/configs/tcnn_encoding_config.py:60-66)."""
    if n_levels <= 1:
        return [base_resolution]
    growth = np.exp((np.log(max_resolution) - np.log(base_resolution))
                    / (n_levels - 1))
    return [int(np.floor(base_resolution * growth ** lv))
            for lv in range(n_levels)]


# the spatial hashing primes of Teschner et al., as used by instant-ngp /
# tcnn HashGrid (the first coordinate is left unmultiplied)
_HASH_PRIMES = (1, 2654435761, 805459861)


def hash_grid_lookup(table: jnp.ndarray, x: jnp.ndarray, res: int,
                     hashmap_size: int) -> jnp.ndarray:
    """One level of multi-res hash encoding: d-linear interpolation of
    hashed corner features.

    table [T, F]; x [..., d] in [0, 1]; returns [..., F].
    When the dense vertex grid fits in the table ((res+1)^d <= T) indexing
    is dense (collision-free), matching tcnn's behavior for coarse levels;
    otherwise corners are hashed with the instant-ngp XOR-prime scheme.
    """
    d = x.shape[-1]
    pos = jnp.clip(x, 0.0, 1.0) * res
    p0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
    frac = pos - p0
    n_vertices = (res + 1) ** d
    dense = n_vertices <= hashmap_size

    # corner offsets [2^d, d]
    corners = np.stack(np.meshgrid(*([np.arange(2)] * d),
                                   indexing="ij"), -1).reshape(-1, d)
    feats = 0.0
    for c in corners:
        pc = p0 + jnp.asarray(c, jnp.int32)           # [..., d]
        if dense:
            idx = pc[..., 0]
            for i in range(1, d):
                idx = idx * (res + 1) + pc[..., i]
        else:
            idx = pc[..., 0] * _HASH_PRIMES[0]
            for i in range(1, d):
                idx = idx ^ (pc[..., i] * np.int32(
                    np.uint32(_HASH_PRIMES[i]).astype(np.int32)))
            idx = jnp.remainder(idx, hashmap_size)
        w = jnp.ones(x.shape[:-1], x.dtype)
        for i in range(d):
            w = w * jnp.where(c[i] == 1, frac[..., i], 1.0 - frac[..., i])
        feats = feats + w[..., None] * table[idx]
    return feats


class HashGridEncoding(nn.Module):
    """Multi-resolution hash encoding (instant-ngp), the tcnn `HashGrid`
    analogue (/root/reference/internal/configs/tcnn_encoding_config.py:37-50,
    used by internal/models/swag_model.py:16 and the visibility-map
    appearance renderer).

    Pure-JAX: the per-level table gathers + d-linear lerp are XLA gathers
    the compiler fuses; tables are Flax params so they train through the
    standard optimizer path. x in [0, 1]^d -> [..., n_levels * n_features].
    """

    n_input_dims: int = 3
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        resolutions = _hash_level_resolutions(
            self.n_levels, self.base_resolution, self.max_resolution)
        T = 1 << self.log2_hashmap_size
        outs = []
        for lv, res in enumerate(resolutions):
            size = min(T, (res + 1) ** self.n_input_dims)
            table = self.param(
                f"table_{lv}",
                nn.initializers.uniform(scale=1e-4),
                (size, self.n_features_per_level))
            outs.append(hash_grid_lookup(table, x, res, size))
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

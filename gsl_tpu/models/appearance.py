"""Appearance-embedding model pieces (Ha-NeRF-style per-image appearance).

Parity with the reference appearance stack:
- AppearanceFeatureGaussian: extra trainable 64-d per-Gaussian feature
  (/root/reference/internal/models/appearance_feature_gaussian.py:19-85),
- embedding + MLP: rgb = clamp(SH_rgb + (MLP(feat, emb, PE(dir))*2 - 1)),
  SH-only warm-up for the first 4000 steps, separate Adam + exp-decay
  schedules for embedding (2e-3) and network (1e-3)
  (/root/reference/internal/renderers/gsplat_appearance_embedding_renderer.py:18-330),
- sin/cos positional encoding
  (/root/reference/internal/encodings/positional_encoding.py:4-45).

The MLP is plain Flax — MXU-friendly already; no tiny-cuda-nn analogue
needed (SURVEY §2.3 N9).
"""
from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import GaussianState, VanillaGaussianConfig


@dataclasses.dataclass
class AppearanceFeatureGaussianConfig(VanillaGaussianConfig):
    appearance_feature_dims: int = 64
    appearance_feature_lr_init: float = 2e-3
    appearance_feature_init: str = "zero"  # zero | normal

    def init_from_pcd(self, xyz: np.ndarray, rgb: np.ndarray,
                      capacity: int) -> GaussianState:
        state = super().init_from_pcd(xyz, rgb, capacity)
        d = self.appearance_feature_dims
        if self.appearance_feature_init == "normal":
            feats = jnp.asarray(np.random.RandomState(0).normal(
                0, 0.02, size=(capacity, d)).astype(np.float32))
        else:
            feats = jnp.zeros((capacity, d), jnp.float32)
        params = state.params.replace(appearance_features=feats)
        return GaussianState(params=params, alive=state.alive,
                             extra=state.extra)


def positional_encoding(x: jnp.ndarray, n_frequencies: int) -> jnp.ndarray:
    """sin/cos PE (reference positional_encoding.py:4-45): output dims =
    input_dims * 2 * n_frequencies."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)
    ang = x[..., None, :] * freqs[:, None]          # [..., F, D]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(*x.shape[:-1], -1)


class AppearanceNetwork(nn.Module):
    """Embedding + skip-MLP: (features, appearance_id, viewdirs) -> offsets
    in [0, 1] (sigmoid)."""

    n_appearances: int
    n_appearance_embedding_dims: int = 32
    n_neurons: int = 64
    n_layers: int = 3
    with_opacity: bool = False
    is_view_dependent: bool = False
    n_view_direction_frequencies: int = 4
    skip_layers: List[int] = dataclasses.field(default_factory=list)

    @nn.compact
    def __call__(self, gaussian_features: jnp.ndarray,
                 appearance_id: jnp.ndarray,
                 view_dirs: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_appearances,
                       self.n_appearance_embedding_dims)(appearance_id)
        emb = jnp.broadcast_to(emb[None, :],
                               (gaussian_features.shape[0], emb.shape[-1]))
        inputs = [gaussian_features, emb]
        if self.is_view_dependent:
            inputs.append(positional_encoding(
                view_dirs, self.n_view_direction_frequencies))
        x = jnp.concatenate(inputs, axis=-1)
        inp = x
        for i in range(self.n_layers - 1):
            if i in self.skip_layers:
                x = jnp.concatenate([x, inp], axis=-1)
            x = nn.relu(nn.Dense(self.n_neurons)(x))
        n_out = 4 if self.with_opacity else 3
        return nn.sigmoid(nn.Dense(n_out)(x))


def network_lr_schedule(lr_init: float, lr_final_factor: float,
                        max_steps: int, warm_up: int):
    """lr(iter) = lr_init * factor^min(max(iter - warm_up, 0)/max_steps, 1)
    (gsplat_appearance_embedding_renderer.py:316-322)."""
    def schedule(step):
        t = jnp.clip((jnp.asarray(step, jnp.float32) - warm_up)
                     / max_steps, 0.0, 1.0)
        return lr_init * (lr_final_factor ** t)
    return schedule

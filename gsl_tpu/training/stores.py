"""Stores: per-Gaussian auxiliary state shared across components.

Parity with /root/reference/internal/stores/:
- VanillaStore: no-op (vanilla_store.py:5-13),
- PartitionStore (partition_store.py:8-89): loads the partition layout,
  registers the owning cell's bbox/rotation and computes each Gaussian's
  normalized distance to the partition — consumed by the foreground-first
  density controller to confine densification to the cell.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..models.gaussian import GaussianState


@dataclasses.dataclass
class VanillaStoreConfig:
    def instantiate(self):
        return self

    def distance_factors(self, gstate: GaussianState):
        return None


@dataclasses.dataclass
class PartitionStoreConfig:
    partitions_path: str = ""     # partitions.npz from utils/partitioning
    partition_idx: int = 0
    distance_normalization: float = 1.0

    def instantiate(self) -> "PartitionStore":
        return PartitionStore(self)


class PartitionStore:
    def __init__(self, config: PartitionStoreConfig):
        from ..utils.partitioning import PartitionedScene

        self.config = config
        scene = PartitionedScene.load(config.partitions_path)
        self.partition = scene.partitions[config.partition_idx]
        self.rotation = jnp.asarray(scene.rotation, jnp.float32)
        self.up_axis = scene.up_axis
        self.size = float(scene.config.partition_size)

    def distance_factors(self, gstate: GaussianState) -> jnp.ndarray:
        """[CAP] normalized distance of each gaussian to the partition cell
        (0 inside; grows outside) — recomputed per batch in the reference
        (partition_store.py:60-89)."""
        p = gstate.params.means @ self.rotation.T
        keep = [i for i in range(3) if i != self.up_axis]
        xy = p[:, keep]
        lo = jnp.asarray(self.partition.xy_min, jnp.float32)
        hi = jnp.asarray(self.partition.xy_max, jnp.float32)
        d = jnp.maximum(jnp.maximum(lo - xy, xy - hi), 0.0)
        dist = jnp.linalg.norm(d, axis=-1)
        return dist / (self.size * self.config.distance_normalization)

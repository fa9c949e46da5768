"""Mip-Splatting renderer: TileRenderer with the 3D filter applied.

Parity with /root/reference/internal/renderers/gsplat_mip_splatting_renderer_v2.py:29
(mixin overriding get_scales/get_opacities; 2D kernel size 0.1).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..models.gaussian import GaussianState
from ..models.mip_splatting import apply_3d_filter
from .tile_renderer import TileRenderer, TileRendererConfig


@dataclasses.dataclass
class MipSplattingRendererConfig(TileRendererConfig):
    filter_2d_kernel_size: float = 0.1
    opacity_compensation: bool = True

    def instantiate(self) -> "MipSplattingRenderer":
        return MipSplattingRenderer(self)


class MipSplattingRenderer(TileRenderer):
    def _filtered(self, gaussians: GaussianState):
        f3d = gaussians.extra["filter_3d"]
        op, scales = apply_3d_filter(
            gaussians.get_scales(), gaussians.get_opacities(), f3d,
            self.config.opacity_compensation)
        return op, scales

    def get_scales(self, gaussians, camera):
        _, scales = self._filtered(gaussians)
        return scales

    def get_opacities(self, gaussians, camera, proj):
        op, _ = self._filtered(gaussians)
        if self.config.anti_aliased:
            op = op * proj.compensations
        return op

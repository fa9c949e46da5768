"""Renderer base types.

Mirrors the reference renderer interface metadata
(/root/reference/internal/renderers/renderer.py:10-117): renderers declare
their available outputs as (key, type) so viewers/metrics can dispatch
visualizers generically.
"""
from __future__ import annotations

import dataclasses
import enum


class RendererOutputType(enum.Enum):
    RGB = "rgb"
    GRAY = "gray"
    NORMAL_MAP = "normal_map"
    FEATURE_MAP = "feature_map"
    OTHER = "other"


@dataclasses.dataclass(frozen=True)
class RendererOutputInfo:
    key: str
    type: RendererOutputType = RendererOutputType.RGB

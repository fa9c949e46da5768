"""Dataparser base contracts.

Parity with the reference dataparser interface
(/root/reference/internal/dataparsers/dataparser.py:12-98): ImageSet
(names/paths/cameras/masks/extra), PointCloud(xyz, rgb), DataParserOutputs
with the default camera extent = 1.1 * max distance to the mean camera
center (dataparser.py:77-83).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from ..cameras import Cameras


@dataclasses.dataclass
class ImageSet:
    image_names: List[str]
    image_paths: List[str]
    cameras: Cameras                      # batched, len == n images
    mask_paths: Optional[List[Optional[str]]] = None
    extra_data: Optional[Dict[str, Any]] = None

    def __len__(self):
        return len(self.image_names)


@dataclasses.dataclass
class PointCloud:
    xyz: np.ndarray  # [N, 3] float
    rgb: np.ndarray  # [N, 3] float in [0, 1]


@dataclasses.dataclass
class DataParserOutputs:
    train_set: ImageSet
    val_set: ImageSet
    test_set: ImageSet
    point_cloud: PointCloud
    camera_extent: float
    appearance_group_ids: Optional[Dict[str, int]] = None

    @property
    def prune_extent(self) -> float:
        return self.camera_extent


def compute_camera_extent(camera_centers: np.ndarray,
                          factor: float = 1.1) -> float:
    """camera_centers [M, 3] -> 1.1 * max dist to mean center
    (reference dataparser.py:77-83)."""
    mean = camera_centers.mean(axis=0, keepdims=True)
    dists = np.linalg.norm(camera_centers - mean, axis=-1)
    return float(dists.max() * factor)


class DataParser:
    def get_outputs(self) -> DataParserOutputs:
        raise NotImplementedError

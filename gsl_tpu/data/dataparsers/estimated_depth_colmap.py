"""Colmap + estimated (monocular) depth maps for depth regularization.

Parity with /root/reference/internal/dataparsers/estimated_depth_colmap_dataparser.py:
loads `<path>/<depth_dir>/<image>.npy` inverse-depth maps and the per-image
scale/offset solved against the SfM points
(`<depth_scale_name>.json`: {name: {"scale": s, "offset": o}});
gt_inverse_depth = depth * scale + offset. Images whose scale falls outside
[lower, upper] x median-scale are dropped from supervision (mask=None).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from .colmap import ColmapDataParser, ColmapDataParserConfig
from .dataparser import DataParserOutputs


@dataclasses.dataclass
class EstimatedDepthColmapDataParserConfig(ColmapDataParserConfig):
    depth_dir: str = "estimated_depths"
    depth_rescaling: bool = True
    depth_scale_name: str = "estimated_depth_scales"
    depth_scale_lower_bound: float = 0.2
    depth_scale_upper_bound: float = 5.0

    def instantiate(self) -> "EstimatedDepthColmapDataParser":
        return EstimatedDepthColmapDataParser(self)


class EstimatedDepthColmapDataParser(ColmapDataParser):
    def get_outputs(self) -> DataParserOutputs:
        outputs = super().get_outputs()
        cfg: EstimatedDepthColmapDataParserConfig = self.config

        scales = {}
        if cfg.depth_rescaling:
            scale_path = os.path.join(cfg.path,
                                      f"{cfg.depth_scale_name}.json")
            with open(scale_path) as f:
                scales = json.load(f)
            vals = [v["scale"] for v in scales.values()]
            median = float(np.median(vals)) if vals else 1.0
            lo = cfg.depth_scale_lower_bound * median
            hi = cfg.depth_scale_upper_bound * median
        for image_set in (outputs.train_set, outputs.val_set):
            depth_info = []
            for name in image_set.image_names:
                base = os.path.splitext(name)[0]
                dpath = os.path.join(cfg.path, cfg.depth_dir,
                                     f"{base}.npy")
                if not os.path.exists(dpath):
                    dpath = os.path.join(cfg.path, cfg.depth_dir,
                                         f"{name}.npy")
                entry: Optional[dict] = None
                if os.path.exists(dpath):
                    if cfg.depth_rescaling:
                        s = scales.get(name) or scales.get(base)
                        if s is not None and lo <= s["scale"] <= hi:
                            entry = {"path": dpath,
                                     "scale": float(s["scale"]),
                                     "offset": float(s.get("offset", 0.0))}
                    else:
                        entry = {"path": dpath, "scale": 1.0, "offset": 0.0}
                depth_info.append(entry)
            image_set.extra_data = {**(image_set.extra_data or {}),
                                    "depth": depth_info}
        return outputs


def load_depth(entry: Optional[dict]) -> Optional[np.ndarray]:
    """-> scaled gt inverse depth [H, W] float32, or None."""
    if entry is None:
        return None
    d = np.load(entry["path"]).astype(np.float32)
    return d * entry["scale"] + entry["offset"]

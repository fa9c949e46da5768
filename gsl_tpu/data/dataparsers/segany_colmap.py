"""SegAny Colmap dataparser: Colmap + precomputed SAM masks/scales.

Parity with /root/reference/internal/dataparsers/segany_colmap_dataparser.py:
attaches `semantic/masks/<name>.pt`-style artifacts (ours: .npy/.npz) paths
as extra_data for the SegAnySplatting second-stage training.
"""
from __future__ import annotations

import dataclasses
import os

from .colmap import ColmapDataParser, ColmapDataParserConfig
from .dataparser import DataParserOutputs


@dataclasses.dataclass
class SegAnyColmapDataParserConfig(ColmapDataParserConfig):
    semantic_mask_dir: str = "semantic/masks"
    semantic_scale_dir: str = "semantic/scales"

    def instantiate(self) -> "SegAnyColmapDataParser":
        return SegAnyColmapDataParser(self)


class SegAnyColmapDataParser(ColmapDataParser):
    def get_outputs(self) -> DataParserOutputs:
        cfg: SegAnyColmapDataParserConfig = self.config
        outputs = super().get_outputs()
        for image_set in (outputs.train_set, outputs.val_set):
            masks, scales = [], []
            for name in image_set.image_names:
                base = os.path.splitext(name)[0]
                m = os.path.join(cfg.path, cfg.semantic_mask_dir,
                                 base + ".npz")
                s = os.path.join(cfg.path, cfg.semantic_scale_dir,
                                 base + ".npy")
                masks.append(m if os.path.exists(m) else None)
                scales.append(s if os.path.exists(s) else None)
            image_set.extra_data = {**(image_set.extra_data or {}),
                                    "sam_masks": masks,
                                    "mask_scales": scales}
        return outputs

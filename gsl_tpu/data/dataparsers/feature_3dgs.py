"""Feature3DGS dataparser: attaches teacher feature-map paths per image.

Parity with the reference Feature3DGSColmap
(/root/reference/internal/dataparsers/feature_3dgs_dataparser.py:1-46):
`<path>/<feature_dir>/<image_name><suffix>.npy` (npy replaces the torch
.pt teacher dumps — tools/get_sam_features.py writes npy)."""
from __future__ import annotations

import dataclasses
import os

from .colmap import ColmapDataParser, ColmapDataParserConfig
from .dataparser import DataParserOutputs


@dataclasses.dataclass
class Feature3DGSColmapDataParserConfig(ColmapDataParserConfig):
    feature_dir: str = "semantic/sam_features"
    filename_suffix: str = ""
    filename_include_image_ext: bool = True

    def instantiate(self) -> "Feature3DGSColmapDataParser":
        return Feature3DGSColmapDataParser(self)


class Feature3DGSColmapDataParser(ColmapDataParser):
    def get_outputs(self) -> DataParserOutputs:
        outputs = super().get_outputs()
        cfg = self.config
        for s in (outputs.train_set, outputs.val_set):
            paths = []
            for nm in s.image_names:
                if not cfg.filename_include_image_ext and "." in nm:
                    nm = nm[:nm.rfind(".")]
                paths.append(os.path.join(
                    cfg.path, cfg.feature_dir,
                    f"{nm}{cfg.filename_suffix}.npy"))
            if s.extra_data is None:
                s.extra_data = {}
            s.extra_data["feature_map_paths"] = paths
        return outputs

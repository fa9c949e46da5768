"""SpotLessSplats dataparser: keyword train/test split + per-image Stable
Diffusion feature paths.

Parity with the reference SpotLessColmap
(/root/reference/internal/dataparsers/spotless_colmap_dataparser.py:1-91):
images whose name contains `train_keyword` train, `test_keyword` evaluate;
each image gets `<semantic_feature_dir>/<name>.npy` attached as its SD
feature path (loaded lazily by the fit loop's spotless branch)."""
from __future__ import annotations

import dataclasses
import os
from typing import Literal

import numpy as np

from .colmap import ColmapDataParser, ColmapDataParserConfig
from .dataparser import DataParserOutputs


@dataclasses.dataclass
class SpotLessColmapDataParserConfig(ColmapDataParserConfig):
    semantic_feature_dir: str = "SD"
    train_keyword: str = "clutter"
    test_keyword: str = "extra"
    keyword_split: bool = True

    def instantiate(self) -> "SpotLessColmapDataParser":
        return SpotLessColmapDataParser(self)


class SpotLessColmapDataParser(ColmapDataParser):
    def get_outputs(self) -> DataParserOutputs:
        outputs = super().get_outputs()
        cfg = self.config

        if cfg.keyword_split:
            # re-split by filename keyword (spotless_colmap_dataparser.py:
            # build_split_indices)
            def pick(keyword):
                sets, idxs, seen = [], [], set()
                for s in (outputs.train_set, outputs.val_set):
                    for i, nm in enumerate(s.image_names):
                        if keyword in nm and nm not in seen:
                            seen.add(nm)
                            sets.append(s)
                            idxs.append(i)
                return sets, idxs

            from .dataparser import ImageSet

            def build(keyword):
                sets, idxs = pick(keyword)
                if not idxs:
                    return None
                cam_list = [sets[k].cameras[idxs[k]]
                            for k in range(len(idxs))]
                import jax
                cams = jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *cam_list)
                return ImageSet(
                    image_names=[sets[k].image_names[idxs[k]]
                                 for k in range(len(idxs))],
                    image_paths=[sets[k].image_paths[idxs[k]]
                                 for k in range(len(idxs))],
                    cameras=cams,
                    extra_data={},
                )

            train_set = build(cfg.train_keyword)
            test_set = build(cfg.test_keyword)
            if train_set is not None:
                outputs = dataclasses.replace(
                    outputs, train_set=train_set,
                    val_set=test_set or outputs.val_set,
                    test_set=test_set or outputs.test_set)

        # attach SD feature paths per image
        for s in (outputs.train_set, outputs.val_set):
            feats = []
            for nm in s.image_names:
                stem = nm[:nm.rfind(".")] if "." in nm else nm
                feats.append(os.path.join(
                    cfg.path, cfg.semantic_feature_dir, stem + ".npy"))
            if s.extra_data is None:
                s.extra_data = {}
            s.extra_data["sd_feature_paths"] = feats
        return outputs

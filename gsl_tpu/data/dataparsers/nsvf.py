"""NSVF (Synthetic-NSVF) dataparser.

Parity with /root/reference/internal/dataparsers/nsvf_dataparser.py: scenes
with `intrinsics.txt` (fx cx cy) + `pose/*.txt` c2w matrices + `rgb/*` images;
split by filename prefix (0_ train, 1_ val, 2_ test); random point init
within the scene bbox (`bbox.txt` when present).
"""
from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np

from ..cameras import Cameras
from .dataparser import (DataParser, DataParserOutputs, ImageSet, PointCloud,
                         compute_camera_extent)


@dataclasses.dataclass
class NSVFDataParserConfig:
    path: str = ""
    random_point_count: int = 100_000

    def instantiate(self) -> "NSVFDataParser":
        return NSVFDataParser(self)


class NSVFDataParser(DataParser):
    def __init__(self, config: NSVFDataParserConfig):
        self.config = config

    def _load(self, prefix: str):
        root = self.config.path
        poses = sorted(glob.glob(os.path.join(root, "pose",
                                              f"{prefix}_*.txt")))
        rgbs = sorted(glob.glob(os.path.join(root, "rgb", f"{prefix}_*")))
        if not poses:
            return None
        with open(os.path.join(root, "intrinsics.txt")) as f:
            vals = f.read().split()
        fx = float(vals[0])
        cx, cy = float(vals[1]), float(vals[2])

        from PIL import Image
        with Image.open(rgbs[0]) as im:
            w, h = im.size

        names, paths, Rs, Ts = [], [], [], []
        for pose_path, rgb_path in zip(poses, rgbs):
            c2w = np.loadtxt(pose_path).reshape(4, 4)
            c2w[:3, 1:3] *= -1  # OpenGL -> OpenCV
            w2c = np.linalg.inv(c2w)
            Rs.append(w2c[:3, :3])
            Ts.append(w2c[:3, 3])
            names.append(os.path.basename(rgb_path))
            paths.append(rgb_path)
        n = len(names)
        cams = Cameras(
            R=np.stack(Rs).astype(np.float32),
            T=np.stack(Ts).astype(np.float32),
            fx=np.full(n, fx, np.float32), fy=np.full(n, fx, np.float32),
            cx=np.full(n, cx, np.float32), cy=np.full(n, cy, np.float32),
            width=np.full(n, w, np.int32), height=np.full(n, h, np.int32),
            appearance_id=np.zeros(n, np.int32),
            time=np.zeros(n, np.float32),
        )
        return ImageSet(image_names=names, image_paths=paths, cameras=cams)

    def get_outputs(self) -> DataParserOutputs:
        train = self._load("0")
        val = self._load("1") or train
        test = self._load("2") or val

        bbox_path = os.path.join(self.config.path, "bbox.txt")
        if os.path.exists(bbox_path):
            bb = np.loadtxt(bbox_path).ravel()
            lo, hi = bb[:3], bb[3:6]
        else:
            lo, hi = np.full(3, -1.5), np.full(3, 1.5)
        rng = np.random.RandomState(42)
        xyz = rng.uniform(lo, hi,
                          size=(self.config.random_point_count, 3))
        rgb = np.full((self.config.random_point_count, 3), 0.5, np.float32)

        centers = np.stack([np.asarray(train.cameras[i].camera_center)
                            for i in range(len(train))])
        return DataParserOutputs(
            train_set=train, val_set=val, test_set=test,
            point_cloud=PointCloud(xyz=xyz.astype(np.float32), rgb=rgb),
            camera_extent=compute_camera_extent(centers),
        )

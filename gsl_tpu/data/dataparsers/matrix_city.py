"""MatrixCity dataparser.

Parity with /root/reference/internal/dataparsers/matrix_city_dataparser.py:56-308:
reads the MatrixCity `transforms.json` lists (train/test), builds cameras
from per-frame `transform_matrix` + shared intrinsics, and constructs the
initial point cloud by unprojecting the (downsampled) depth maps.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List

import numpy as np

from ..cameras import Cameras
from .dataparser import (DataParser, DataParserOutputs, ImageSet, PointCloud,
                         compute_camera_extent)


@dataclasses.dataclass
class MatrixCityDataParserConfig:
    path: str = ""
    train: List[str] = dataclasses.field(
        default_factory=lambda: ["transforms_train.json"])
    test: List[str] = dataclasses.field(
        default_factory=lambda: ["transforms_test.json"])
    depth_read_step: int = 4         # depth-pixel subsampling for points
    max_points: int = 3_000_000
    depth_scale: float = 0.01        # MatrixCity depth unit -> meters/100

    def instantiate(self) -> "MatrixCityDataParser":
        return MatrixCityDataParser(self)


class MatrixCityDataParser(DataParser):
    def __init__(self, config: MatrixCityDataParserConfig):
        self.config = config

    def _load_set(self, json_names) -> ImageSet:
        names, paths, Rs, Ts = [], [], [], []
        fx = fy = cx = cy = w = h = None
        fxs, fys, cxs, cys, ws, hs = [], [], [], [], [], []
        self._depth_paths = getattr(self, "_depth_paths", [])
        depth_paths = []
        for jn in json_names:
            jp = os.path.join(self.config.path, jn)
            with open(jp) as f:
                meta = json.load(f)
            base = os.path.dirname(jp)
            fl_x = meta.get("fl_x")
            fl_y = meta.get("fl_y", fl_x)
            for frame in meta["frames"]:
                fp = frame["file_path"]
                img_path = os.path.normpath(os.path.join(base, fp))
                c2w = np.array(frame["transform_matrix"], np.float64)
                c2w[:3, 1:3] *= -1
                w2c = np.linalg.inv(c2w)
                Rs.append(w2c[:3, :3])
                Ts.append(w2c[:3, 3])
                names.append(os.path.relpath(img_path, self.config.path))
                paths.append(img_path)
                fxs.append(frame.get("fl_x", fl_x))
                fys.append(frame.get("fl_y", fl_y))
                ws.append(int(frame.get("w", meta.get("w", 1000))))
                hs.append(int(frame.get("h", meta.get("h", 1000))))
                cxs.append(frame.get("cx", meta.get("cx", ws[-1] / 2)))
                cys.append(frame.get("cy", meta.get("cy", hs[-1] / 2)))
                depth_paths.append(img_path.replace(
                    "rgb", "depth").rsplit(".", 1)[0] + ".exr")
        n = len(names)
        cams = Cameras(
            R=np.stack(Rs).astype(np.float32),
            T=np.stack(Ts).astype(np.float32),
            fx=np.asarray(fxs, np.float32), fy=np.asarray(fys, np.float32),
            cx=np.asarray(cxs, np.float32), cy=np.asarray(cys, np.float32),
            width=np.asarray(ws, np.int32), height=np.asarray(hs, np.int32),
            appearance_id=np.arange(n, dtype=np.int32),
            time=np.zeros(n, np.float32))
        self._depth_paths = depth_paths
        return ImageSet(image_names=names, image_paths=paths, cameras=cams)

    def _points_from_depths(self, image_set: ImageSet) -> PointCloud:
        """Unproject depth maps into a world point cloud
        (matrix_city_dataparser.py:56-265)."""
        cfg = self.config
        xyz_all, rgb_all = [], []
        step = cfg.depth_read_step
        try:
            import cv2
        except ImportError:
            cv2 = None
        from PIL import Image
        for i, dpath in enumerate(self._depth_paths):
            if cv2 is None or not os.path.exists(dpath):
                continue
            depth = cv2.imread(dpath,
                               cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
            if depth is None:
                continue
            if depth.ndim == 3:
                depth = depth[..., 0]
            depth = depth[::step, ::step].astype(np.float64) \
                * cfg.depth_scale
            cam = image_set.cameras[i]
            H, W = depth.shape
            ys, xs = np.mgrid[0:H, 0:W]
            xs = xs * step + 0.5
            ys = ys * step + 0.5
            valid = (depth > 0) & np.isfinite(depth)
            z = depth[valid]
            x = (xs[valid] - float(cam.cx)) / float(cam.fx) * z
            y = (ys[valid] - float(cam.cy)) / float(cam.fy) * z
            p_cam = np.stack([x, y, z], axis=-1)
            R = np.asarray(cam.R, np.float64)
            t = np.asarray(cam.T, np.float64)
            p_world = (p_cam - t) @ R
            xyz_all.append(p_world)
            with Image.open(image_set.image_paths[i]) as im:
                rgb = np.asarray(im)[::step, ::step, :3]
            rgb_all.append(rgb[valid].astype(np.float32) / 255.0)
        if not xyz_all:
            rng = np.random.RandomState(0)
            return PointCloud(
                xyz=rng.uniform(-50, 50, (100_000, 3)).astype(np.float32),
                rgb=np.full((100_000, 3), 0.5, np.float32))
        xyz = np.concatenate(xyz_all).astype(np.float32)
        rgb = np.concatenate(rgb_all)
        if xyz.shape[0] > cfg.max_points:
            sel = np.random.RandomState(0).choice(
                xyz.shape[0], cfg.max_points, replace=False)
            xyz, rgb = xyz[sel], rgb[sel]
        return PointCloud(xyz=xyz, rgb=rgb)

    def get_outputs(self) -> DataParserOutputs:
        train = self._load_set(self.config.train)
        pc = self._points_from_depths(train)
        test = (self._load_set(self.config.test)
                if self.config.test else train)
        centers = np.stack([np.asarray(train.cameras[i].camera_center)
                            for i in range(len(train))])
        return DataParserOutputs(
            train_set=train, val_set=test, test_set=test, point_cloud=pc,
            camera_extent=compute_camera_extent(centers))

"""Nerfies/HyperNeRF dataparser.

Parity with /root/reference/internal/dataparsers/nerfies_dataparser.py:
`dataset.json` (train/val ids), `scene.json` (scale/center), per-image
`camera/<id>.json` (orientation, position, focal_length, principal_point),
`rgb/{downsample}x/<id>.png` images; per-frame normalized time from
`metadata.json` when present (dynamic scenes).
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..cameras import Cameras
from .dataparser import (DataParser, DataParserOutputs, ImageSet, PointCloud,
                         compute_camera_extent)


@dataclasses.dataclass
class NerfiesDataParserConfig:
    path: str = ""
    downsample: int = 1
    random_point_count: int = 100_000

    def instantiate(self) -> "NerfiesDataParser":
        return NerfiesDataParser(self)


class NerfiesDataParser(DataParser):
    def __init__(self, config: NerfiesDataParserConfig):
        self.config = config

    def _image_set(self, ids, scene_scale, scene_center, times) -> ImageSet:
        cfg = self.config
        sub = f"{cfg.downsample}x" if cfg.downsample > 1 else "1x"
        names, paths, Rs, Ts = [], [], [], []
        fxs, fys, cxs, cys, ws, hs, tms = [], [], [], [], [], [], []
        from PIL import Image
        for iid in ids:
            cam_path = os.path.join(cfg.path, "camera", f"{iid}.json")
            with open(cam_path) as f:
                c = json.load(f)
            R_c2w = np.array(c["orientation"], np.float64)
            pos = (np.array(c["position"], np.float64)
                   - np.asarray(scene_center)) * scene_scale
            # nerfies stores world-to-camera orientation (rows) + position
            R = R_c2w
            T = -R @ pos
            img_path = os.path.join(cfg.path, "rgb", sub, f"{iid}.png")
            names.append(f"{iid}.png")
            paths.append(img_path)
            Rs.append(R)
            Ts.append(T)
            f_scale = 1.0 / cfg.downsample
            fxs.append(c["focal_length"] * f_scale)
            fys.append(c["focal_length"]
                       * c.get("pixel_aspect_ratio", 1.0) * f_scale)
            pp = c.get("principal_point", [0, 0])
            cxs.append(pp[0] * f_scale)
            cys.append(pp[1] * f_scale)
            if os.path.exists(img_path):
                with Image.open(img_path) as im:
                    w, h = im.size
            else:
                w = int(c.get("image_size", [1000, 1000])[0] * f_scale)
                h = int(c.get("image_size", [1000, 1000])[1] * f_scale)
            ws.append(w)
            hs.append(h)
            tms.append(times.get(iid, 0.0))
        n = len(names)
        cams = Cameras(
            R=np.stack(Rs).astype(np.float32),
            T=np.stack(Ts).astype(np.float32),
            fx=np.asarray(fxs, np.float32), fy=np.asarray(fys, np.float32),
            cx=np.asarray(cxs, np.float32), cy=np.asarray(cys, np.float32),
            width=np.asarray(ws, np.int32), height=np.asarray(hs, np.int32),
            appearance_id=np.arange(n, dtype=np.int32),
            time=np.asarray(tms, np.float32))
        return ImageSet(image_names=names, image_paths=paths, cameras=cams)

    def get_outputs(self) -> DataParserOutputs:
        cfg = self.config
        with open(os.path.join(cfg.path, "dataset.json")) as f:
            ds = json.load(f)
        with open(os.path.join(cfg.path, "scene.json")) as f:
            scene = json.load(f)
        scale = scene.get("scale", 1.0)
        center = scene.get("center", [0.0, 0.0, 0.0])

        times = {}
        meta_path = os.path.join(cfg.path, "metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            tids = [meta[i].get("time_id", 0) for i in ds["ids"]
                    if i in meta]
            t_max = max(tids) if tids else 1
            for iid in ds["ids"]:
                if iid in meta:
                    times[iid] = meta[iid].get("time_id", 0) / max(t_max, 1)

        train_ids = ds.get("train_ids", ds["ids"])
        val_ids = ds.get("val_ids", []) or train_ids[:1]
        train = self._image_set(train_ids, scale, center, times)
        val = self._image_set(val_ids, scale, center, times)

        pts_path = os.path.join(cfg.path, "points.npy")
        if os.path.exists(pts_path):
            xyz = ((np.load(pts_path) - np.asarray(center)) * scale)
            rgb = np.full((xyz.shape[0], 3), 0.5, np.float32)
        else:
            rng = np.random.RandomState(42)
            xyz = rng.uniform(-1.5, 1.5, (cfg.random_point_count, 3))
            rgb = np.full((cfg.random_point_count, 3), 0.5, np.float32)

        centers = np.stack([np.asarray(train.cameras[i].camera_center)
                            for i in range(len(train))])
        return DataParserOutputs(
            train_set=train, val_set=val, test_set=val,
            point_cloud=PointCloud(xyz=xyz.astype(np.float32), rgb=rgb),
            camera_extent=compute_camera_extent(centers))

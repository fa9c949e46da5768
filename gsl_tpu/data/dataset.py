"""Image loading + in-RAM cached data loader.

TPU analogue of the reference Dataset/CacheDataLoader
(/root/reference/internal/dataset.py:54-305): images are decoded once to
uint8 and cached host-side; the loader yields (camera, image[, mask]) with
per-epoch shuffling. TPU input is tiny (one image per step), so a simple
prefetch-free loop suffices; `async_prefetch` adds a one-element lookahead
thread for overlap with device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .cameras import Cameras
from .dataparsers.dataparser import ImageSet


def load_image(path: str, background: Optional[np.ndarray] = None
               ) -> np.ndarray:
    """Decode to float32 HWC in [0,1]; RGBA alpha-blended onto background
    (reference dataset.py blender handling)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:4]
        bg = background if background is not None else np.zeros(3, np.float32)
        arr = rgb * a + bg[None, None, :] * (1.0 - a)
    return arr[..., :3]


class CachedDataset:
    """uint8 in-RAM cache of an ImageSet."""

    def __init__(self, image_set: ImageSet,
                 background: Optional[np.ndarray] = None):
        self.image_set = image_set
        self.background = background
        self._cache = {}
        self._mask_cache = {}

    def __len__(self):
        return len(self.image_set)

    def _distortion(self, i: int):
        extra = self.image_set.extra_data or {}
        d = extra.get("distortion")
        if d is None or d[i] is None:
            return None
        d = np.asarray(d[i])
        return d if np.any(d != 0) else None

    def get_mask(self, i: int) -> Optional[np.ndarray]:
        """Per-image mask [H, W] float32, 1 = keep, 0 = masked out
        (reference internal/dataset.py:118-137: nonzero mask pixels kept;
        nearest-resized when the mask resolution differs)."""
        paths = self.image_set.mask_paths
        if paths is None or paths[i] is None:
            return None
        key = ("mask", i)
        if key not in self._mask_cache:
            from PIL import Image

            with Image.open(paths[i]) as im:
                m = np.asarray(im)
            if m.ndim == 3:
                m = m[..., 0]
            self._mask_cache[key] = (m != 0)
        m = self._mask_cache[key]
        return m.astype(np.float32)

    def get(self, i: int) -> Tuple[Cameras, str, np.ndarray]:
        if i not in self._cache:
            img = load_image(self.image_set.image_paths[i], self.background)
            dist = self._distortion(i)
            if dist is not None:
                # undistort once at load (reference dataset.py:54 get_image)
                try:
                    import cv2
                    cam = self.image_set.cameras[i]
                    K = np.asarray(cam.get_K(), np.float64)
                    u8 = (img * 255).astype(np.uint8)
                    if dist.shape[0] >= 5 and dist[4] != 0:
                        # OPENCV_FISHEYE: equidistant model, NOT the
                        # radial-tangential one cv2.undistort assumes
                        img = cv2.fisheye.undistortImage(
                            u8, K, np.array(dist[0:4], np.float64),
                            Knew=K).astype(np.float32) / 255.0
                    else:
                        img = cv2.undistort(
                            u8, K,
                            np.array([dist[0], dist[1], dist[2], dist[3]])
                        ).astype(np.float32) / 255.0
                except ImportError:
                    pass
            self._cache[i] = (img * 255.0 + 0.5).astype(np.uint8)
        img = self._cache[i].astype(np.float32) / 255.0
        mask = self.get_mask(i)
        if mask is not None and mask.shape[:2] != img.shape[:2]:
            # nearest resize (reference allow_mask_interpolation path)
            ys = (np.arange(img.shape[0]) * mask.shape[0]
                  // img.shape[0]).clip(0, mask.shape[0] - 1)
            xs = (np.arange(img.shape[1]) * mask.shape[1]
                  // img.shape[1]).clip(0, mask.shape[1] - 1)
            mask = mask[np.ix_(ys, xs)]
        return (self.image_set.cameras[i], self.image_set.image_names[i],
                img, mask)


class DataLoader:
    """Infinite shuffled iterator with optional background prefetch."""

    def __init__(self, dataset: CachedDataset, shuffle: bool = True,
                 seed: int = 0, async_prefetch: bool = True,
                 rank: int = 0, world_size: int = 1, skip: int = 0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed + rank)
        self.rank = rank
        self.world_size = world_size
        self.async_prefetch = async_prefetch
        self.skip = skip  # fast-forward (training resume): index-only

    def _indices(self):
        idx = np.arange(len(self.dataset))
        # per-rank disjoint slices (reference --data.distributed semantics,
        # dataset.py:550)
        if self.world_size > 1:
            idx = idx[self.rank::self.world_size]
        while True:
            order = self.rng.permutation(idx) if self.shuffle else idx
            yield from order

    def __iter__(self) -> Iterator[Tuple[Cameras, str, np.ndarray]]:
        gen = self._indices()
        for _ in range(self.skip):
            next(gen)
        if not self.async_prefetch:
            for i in gen:
                yield self.dataset.get(int(i))
            return

        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def worker():
            for i in gen:
                if stop.is_set():
                    return
                q.put(self.dataset.get(int(i)))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


def add_background_sphere(point_cloud, camera_centers: np.ndarray,
                          distance: float = 2.2, n_points: int = 204_800,
                          seed: int = 7):
    """Append a sphere of random points around the scene so the sky/background
    has gaussians to use (reference dataset.py:457 `_build_background_sphere`,
    graphdeco-inria/gaussian-splatting#300)."""
    from .dataparsers.dataparser import PointCloud

    center = camera_centers.mean(axis=0)
    radius = float(np.linalg.norm(camera_centers - center, axis=-1).max())
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n_points, 3))
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    xyz = center + d * radius * distance
    rgb = rng.uniform(0.0, 1.0, size=(n_points, 3)).astype(np.float32)
    return PointCloud(
        xyz=np.concatenate([point_cloud.xyz, xyz.astype(np.float32)]),
        rgb=np.concatenate([point_cloud.rgb, rgb]))

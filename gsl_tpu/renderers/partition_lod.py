"""Partition-LoD serving renderer: city-scale scenes from per-partition
models at multiple levels of detail.

TPU-native redesign of the reference PartitionLoDRenderer
(/root/reference/internal/renderers/partition_lod_renderer.py:22-787):

- per-frame, each partition's LoD level is picked by the 2D distance from
  the camera center to the partition's bbox (thresholds =
  lod_distances[i] * partition_size, finest -> coarsest;
  partition_lod_renderer.py:550-557),
- optional frustum visibility culling. The reference calls pytorch3d's
  CUDA `_box3d_overlap` for the exact intersection volume but only
  thresholds it to a boolean (`iset_vol > 1e-8`, :600-608); here the
  boolean convex-convex intersection is decided by a pure-numpy SAT test
  (face normals + edge cross products — exact for convex polytopes),
- the assembled scene renders through the standard TileRenderer. TPU
  twist: instead of concatenating a ragged model per selection change
  (which would recompile the jitted render for every new shape), the
  selection is packed host-side into a FIXED-capacity GaussianState
  buffer with an alive mask — the render stays one cached jit.

Selection is cached: the buffer is only re-packed when (lods, visibility)
change (partition_lod_renderer.py:604-633 does the same).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.gaussian import GaussianParams, GaussianState
from ..utils.partitioning import PartitionedScene
from .tile_renderer import TileRenderer, TileRendererConfig


def _polytope_axes(corners: np.ndarray):
    """Face normals + edge dirs of an 8-corner box-like convex polytope
    (unit-box corner ordering, partition_lod_renderer.py:468-478)."""
    e0 = corners[1] - corners[0]
    e1 = corners[3] - corners[0]
    e2 = corners[4] - corners[0]
    edges = np.stack([e0, e1, e2])
    normals = np.stack([np.cross(e0, e1), np.cross(e0, e2),
                        np.cross(e1, e2)])
    return normals, edges


def convex_boxes_intersect(corners_a: np.ndarray,
                           corners_b: np.ndarray) -> np.ndarray:
    """SAT intersection test: frustum-like polytope A [8,3] vs N boxes
    [N,8,3] -> [N] bool. Exact for convex polytopes: separating axis must
    be a face normal of A or B or a cross product of edges."""
    na, ea = _polytope_axes(corners_a)
    axes = [na]
    nb_list, eb_list = [], []
    for i in range(corners_b.shape[0]):
        nb, eb = _polytope_axes(corners_b[i])
        nb_list.append(nb)
        eb_list.append(eb)
    nb = np.stack(nb_list)                       # [N, 3, 3]
    eb = np.stack(eb_list)                       # [N, 3, 3]

    out = np.ones(corners_b.shape[0], bool)
    # axes common to all B: A's face normals; per-B: B's normals + crosses
    cross = np.cross(ea[None, :, None, :], eb[:, None, :, :]
                     ).reshape(corners_b.shape[0], -1, 3)   # [N, 9, 3]
    per_b_axes = np.concatenate(
        [np.broadcast_to(na[None], (corners_b.shape[0], 3, 3)),
         nb, cross], axis=1)                      # [N, 15, 3]
    norms = np.linalg.norm(per_b_axes, axis=-1, keepdims=True)
    per_b_axes = np.where(norms > 1e-9, per_b_axes / np.maximum(norms, 1e-9),
                          0.0)
    pa = np.einsum("nkd,cd->nkc", per_b_axes, corners_a)   # [N, 15, 8]
    pb = np.einsum("nkd,ncd->nkc", per_b_axes, corners_b)  # [N, 15, 8]
    sep = ((pa.max(-1) < pb.min(-1) - 1e-9)
           | (pb.max(-1) < pa.min(-1) - 1e-9))   # [N, 15]
    live = np.linalg.norm(per_b_axes, axis=-1) > 1e-9
    out = ~np.any(sep & live, axis=1)
    return out


@dataclasses.dataclass
class PartitionLoDConfig:
    data: str = ""
    """directory containing partitions.npz plus one subdirectory per LoD"""
    names: Sequence[str] = ()
    """LoD subdirectory names, FINEST first (reference `names`); each holds
    partition_%03d run dirs (checkpoints or PLYs)"""
    lod_distances: Sequence[float] = ()
    """len(names)-1 multipliers of partition_size: partitions closer than
    lod_distances[i]*size render at level i (finest levels first)"""
    visibility_filter: bool = False
    renderer: TileRendererConfig = dataclasses.field(
        default_factory=TileRendererConfig)
    capacity: Optional[int] = None
    """static assembly buffer size; default = total finest-LoD gaussians"""

    def instantiate(self) -> "PartitionLoDRenderer":
        return PartitionLoDRenderer(self)


class PartitionLoDRenderer:
    def __init__(self, config: PartitionLoDConfig):
        self.config = config
        self.renderer = config.renderer.instantiate()
        self._loaded = False
        self._cached_key = None
        self._cached_state = None

    # ---- loading ----
    def setup(self):
        from ..utils.gaussian_model_loader import GaussianModelLoader

        cfg = self.config
        scene = PartitionedScene.load(os.path.join(cfg.data,
                                                   "partitions.npz"))
        self.scene = scene
        self.rotation = np.asarray(scene.rotation, np.float32)
        self.partition_size = float(scene.config.partition_size)

        # lods[level][pi] = dict of numpy arrays (alive rows only) or None
        self.lods: List[List[Optional[dict]]] = []
        self.sh_degree = 3
        kept = None
        for name in cfg.names:
            level = []
            for pi in range(len(scene.partitions)):
                run = os.path.join(cfg.data, name, f"partition_{pi:03d}")
                try:
                    state, _, shd = GaussianModelLoader.load(run)
                except FileNotFoundError:
                    level.append(None)
                    continue
                self.sh_degree = shd
                alive = np.asarray(state.alive)
                level.append({
                    k: np.asarray(getattr(state.params, k))[alive]
                    for k in ("means", "scales", "rotations", "opacities",
                              "shs_dc", "shs_rest")})
            self.lods.append(level)
        # partitions present at the finest level only
        kept = [pi for pi in range(len(scene.partitions))
                if self.lods[0][pi] is not None]
        if not kept:
            raise FileNotFoundError(
                f"no trained partitions found under {cfg.data}")
        self.partition_idx = np.asarray(kept)
        self.bbox_min = np.stack(
            [scene.partitions[pi].xy_min for pi in kept]).astype(np.float32)
        self.bbox_max = np.stack(
            [scene.partitions[pi].xy_max for pi in kept]).astype(np.float32)
        # full 3D bounds per partition (from the finest LoD means) for the
        # frustum visibility test
        corners = []
        for pi in kept:
            m = self.lods[0][pi]["means"]
            lo, hi = m.min(0), m.max(0)
            c = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                          [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                          [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                          [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]],
                         np.float32)
            corners.append(c)
        self.box_corners = np.stack(corners)      # [P, 8, 3]

        if cfg.capacity is None:
            total = sum(self.lods[0][pi]["means"].shape[0] for pi in kept)
            cfg.capacity = max(-(-total // 1024) * 1024, 1024)
        self.thresholds = np.asarray(
            [d * self.partition_size for d in cfg.lod_distances], np.float32)
        self._loaded = True
        return self

    # ---- selection ----
    def partition_distances(self, camera_center: np.ndarray) -> np.ndarray:
        """2D point-to-bbox distance in the reoriented ground plane
        (partition_lod_renderer.py:498-504)."""
        from ..utils.partitioning import _project_xy
        p = _project_xy(np.asarray(camera_center, np.float32)[None],
                        self.rotation, self.scene.up_axis)[0]
        d = np.maximum(self.bbox_min - p, p - self.bbox_max)
        return np.sqrt((np.maximum(d, 0.0) ** 2).sum(-1))

    def select(self, camera):
        center = np.asarray(camera.camera_center)
        dist = self.partition_distances(center)
        n_lod = len(self.lods)
        lods = np.full(dist.shape, n_lod - 1, np.int32)
        for i in range(n_lod - 2, -1, -1):
            lods[dist < self.thresholds[i]] = i

        visible = np.ones(dist.shape, bool)
        if self.config.visibility_filter:
            visible = self._frustum_visibility(camera, dist)
            visible[int(np.argmin(dist))] = True  # closest always visible
        return lods, visible

    def _frustum_visibility(self, camera, dist):
        W = int(camera.width)
        H = int(camera.height)
        K = np.array([[float(camera.fx), 0, float(camera.cx)],
                      [0, float(camera.fy), float(camera.cy)],
                      [0, 0, 1]], np.float32)
        px = np.array([[0, 0, 1], [W, 0, 1], [W, H, 1], [0, H, 1]],
                      np.float32)
        rays = px @ np.linalg.inv(K).T
        far = 10.0 * max(float(dist.max()), self.partition_size)
        frustum = np.concatenate([rays * 0.1, rays * far], axis=0)
        w2c = np.asarray(camera.world_to_camera, np.float32)
        boxes_cam = self.box_corners @ w2c[:3, :3].T + w2c[:3, 3]
        return convex_boxes_intersect(frustum, boxes_cam)

    # ---- assembly ----
    def _assemble(self, lods, visible) -> GaussianState:
        cap = self.config.capacity
        parts = []
        for j, pi in enumerate(self.partition_idx):
            if not visible[j]:
                continue
            level = min(int(lods[j]), len(self.lods) - 1)
            # fall back to the nearest coarser/finer level that exists
            cand = self.lods[level][pi]
            if cand is None:
                for lv in list(range(level + 1, len(self.lods))) + \
                        list(range(level - 1, -1, -1)):
                    if self.lods[lv][pi] is not None:
                        cand = self.lods[lv][pi]
                        break
            if cand is not None:
                parts.append(cand)
        cat = {k: np.concatenate([p[k] for p in parts], axis=0)
               for k in parts[0]}
        n = cat["means"].shape[0]
        if n > cap:
            raise ValueError(
                f"assembly overflow: {n} gaussians > capacity {cap}; "
                f"raise PartitionLoDConfig.capacity")

        def pad(x, fill=0.0):
            out = np.full((cap,) + x.shape[1:], fill, x.dtype)
            out[:n] = x
            return jnp.asarray(out)

        params = GaussianParams(
            means=pad(cat["means"]),
            scales=pad(cat["scales"], fill=-15.0),
            rotations=pad(cat["rotations"]).at[n:, 0].set(1.0),
            opacities=pad(cat["opacities"], fill=-15.0),
            shs_dc=pad(cat["shs_dc"]),
            shs_rest=pad(cat["shs_rest"]),
        )
        alive = jnp.asarray(np.arange(cap) < n)
        return GaussianState(params=params, alive=alive), n

    # ---- render ----
    def forward(self, camera, img_height, img_width, bg_color,
                render_types=frozenset({"rgb"})):
        assert self._loaded, "call setup() first"
        lods, visible = self.select(camera)
        key = (tuple(lods.tolist()), tuple(visible.tolist()))
        if key != self._cached_key:
            self._cached_state, self._n_gaussians = self._assemble(
                lods, visible)
            self._cached_key = key
        out = self.renderer.forward(
            self._cached_state, camera, img_height, img_width, bg_color,
            self.sh_degree, render_types=render_types)
        return out, {"n_gaussians": self._n_gaussians,
                     "partition_lods": lods, "visible": visible}

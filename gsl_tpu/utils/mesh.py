"""TSDF fusion + isosurface extraction (no external mesh libraries).

TPU-native replacement for the reference 2DGS mesh pipeline
(/root/reference/internal/utils/gs2d_mesh_utils.py:1-352 +
utils/gs2d_mesh_extraction.py), which delegates to open3d's
ScalableTSDFVolume and marching cubes. Here:

- TSDF integration is a jitted JAX kernel: voxel centers project into each
  camera's (median) depth map, the truncated SDF updates a weighted
  running mean (classic KinectFusion update; open3d `integrate` semantics
  with voxel_size / sdf_trunc / depth_trunc parameters, reference defaults
  gs2d_mesh_utils.py:279-281),
- the isosurface is extracted with MARCHING TETRAHEDRA (6 tets per voxel
  cell). Unlike marching cubes there is no 256-entry magic table — the
  16-case tet table is derived programmatically — and the surface is
  guaranteed crack-free since adjacent cells share tet faces.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# TSDF volume
# ---------------------------------------------------------------------------

class TSDFVolume:
    """Axis-aligned TSDF grid with weighted-average integration."""

    def __init__(self, origin, resolution, voxel_size, sdf_trunc=None):
        self.origin = np.asarray(origin, np.float32)          # [3]
        self.resolution = tuple(int(r) for r in resolution)   # (X, Y, Z)
        self.voxel_size = float(voxel_size)
        self.sdf_trunc = float(sdf_trunc if sdf_trunc is not None
                               else 5.0 * voxel_size)
        n = int(np.prod(self.resolution))
        self.tsdf = jnp.ones((n,), jnp.float32)
        self.weight = jnp.zeros((n,), jnp.float32)
        ix, iy, iz = np.meshgrid(*[np.arange(r) for r in self.resolution],
                                 indexing="ij")
        centers = (np.stack([ix, iy, iz], -1).reshape(-1, 3) + 0.5) \
            * self.voxel_size + self.origin
        self._centers = jnp.asarray(centers.astype(np.float32))

    def integrate(self, depth, w2c, K, alpha: Optional[jnp.ndarray] = None,
                  depth_trunc: float = np.inf, alpha_thres: float = 0.5):
        """depth [H, W] metric z; w2c [4, 4]; K [3, 3]."""
        self.tsdf, self.weight = _integrate(
            self.tsdf, self.weight, self._centers, jnp.asarray(depth),
            jnp.asarray(w2c, jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(alpha) if alpha is not None else None,
            self.sdf_trunc, float(depth_trunc), float(alpha_thres))

    def sdf_grid(self) -> np.ndarray:
        sdf = np.asarray(self.tsdf).reshape(self.resolution)
        w = np.asarray(self.weight).reshape(self.resolution)
        sdf = sdf.copy()
        sdf[w <= 0] = np.nan          # unobserved: no surface extracted
        return sdf

    def extract_mesh(self, min_weight: float = 1.0):
        sdf = np.asarray(self.tsdf).reshape(self.resolution).copy()
        w = np.asarray(self.weight).reshape(self.resolution)
        sdf[w < min_weight] = np.nan
        verts, faces = marching_tetrahedra(sdf, level=0.0)
        verts = verts * self.voxel_size + self.origin \
            + 0.5 * self.voxel_size
        return verts, faces


@functools.partial(jax.jit, static_argnames=())
def _integrate(tsdf, weight, centers, depth, w2c, K, alpha, sdf_trunc,
               depth_trunc, alpha_thres):
    H, W = depth.shape
    p_cam = centers @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    u = K[0, 0] * p_cam[:, 0] / z_safe + K[0, 2]
    v = K[1, 1] * p_cam[:, 1] / z_safe + K[1, 2]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    d = depth[vi, ui]
    valid = ((z > 1e-4) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
             & (d > 1e-4) & (d < depth_trunc))
    if alpha is not None:
        valid = valid & (alpha[vi, ui] > alpha_thres)
    sdf = (d - z) / sdf_trunc
    valid = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    w_new = valid.astype(jnp.float32)
    wsum = weight + w_new
    tsdf = jnp.where(wsum > 0,
                     (tsdf * weight + sdf * w_new) / jnp.maximum(wsum, 1e-9),
                     tsdf)
    return tsdf, wsum


# ---------------------------------------------------------------------------
# marching tetrahedra
# ---------------------------------------------------------------------------

# cube corner offsets (x, y, z)
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int64)
# 6-tet decomposition of the cube around the 0-6 diagonal (consistent
# across neighboring cells -> crack-free shared faces)
_TETS = np.array([[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
                  [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], np.int64)


def _tet_cases():
    """case (4-bit inside mask) -> list of triangles, each triangle a list
    of 3 edges, each edge a (corner_i, corner_j) pair. Derived, not a
    magic table."""
    cases = []
    for mask in range(16):
        inside = [i for i in range(4) if (mask >> i) & 1]
        outside = [i for i in range(4) if not (mask >> i) & 1]
        if len(inside) in (0, 4):
            cases.append([])
        elif len(inside) == 1:
            i = inside[0]
            tri = [(i, outside[0]), (i, outside[1]), (i, outside[2])]
            cases.append([tri])
        elif len(inside) == 3:
            o = outside[0]
            tri = [(inside[0], o), (inside[2], o), (inside[1], o)]
            cases.append([tri])
        else:  # two inside: quad from the 4 crossing edges, cyclic order
            i1, i2 = inside
            o1, o2 = outside
            e = [(i1, o1), (i1, o2), (i2, o2), (i2, o1)]
            cases.append([[e[0], e[1], e[2]], [e[0], e[2], e[3]]])
    return cases


_CASES = _tet_cases()


def marching_tetrahedra(sdf: np.ndarray, level: float = 0.0):
    """sdf [X, Y, Z] (NaN = unobserved, skipped) -> (verts [V, 3] in voxel
    coords, faces [F, 3] int). Vertices deduplicated by shared edge key."""
    X, Y, Z = sdf.shape
    cx, cy, cz = X - 1, Y - 1, Z - 1
    base = np.stack(np.meshgrid(np.arange(cx), np.arange(cy),
                                np.arange(cz), indexing="ij"),
                    -1).reshape(-1, 3)                       # [C, 3]

    corner_idx = base[:, None, :] + _CORNERS[None, :, :]     # [C, 8, 3]
    vals = sdf[corner_idx[..., 0], corner_idx[..., 1],
               corner_idx[..., 2]]                           # [C, 8]
    ok = ~np.any(np.isnan(vals), axis=1)
    base, corner_idx, vals = base[ok], corner_idx[ok], vals[ok]

    # global corner ids for edge dedup keys
    def cid(idx3):
        return (idx3[..., 0] * Y + idx3[..., 1]) * Z + idx3[..., 2]

    corner_gid = cid(corner_idx)                             # [C, 8]

    tri_edge_a = []     # per-triangle: 3 global edge endpoints (lo, hi)
    tri_edge_b = []
    for tet in _TETS:
        tvals = vals[:, tet]                                 # [C, 4]
        tgid = corner_gid[:, tet]
        inside = tvals < level
        case = (inside * (1 << np.arange(4))).sum(1)         # [C]
        for cnum in range(1, 15):
            tris = _CASES[cnum]
            if not tris:
                continue
            rows = np.nonzero(case == cnum)[0]
            if rows.size == 0:
                continue
            for tri in tris:
                ea = np.stack([tgid[rows, i] for (i, j) in tri], 1)
                eb = np.stack([tgid[rows, j] for (i, j) in tri], 1)
                tri_edge_a.append(ea)
                tri_edge_b.append(eb)

    if not tri_edge_a:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    ea = np.concatenate(tri_edge_a)                          # [F, 3]
    eb = np.concatenate(tri_edge_b)
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    keys = lo.astype(np.int64) * (X * Y * Z) + hi            # [F, 3]
    uniq, inv = np.unique(keys.reshape(-1), return_inverse=True)
    faces = inv.reshape(-1, 3)

    # interpolate each unique edge vertex
    ulo = (uniq // (X * Y * Z)).astype(np.int64)
    uhi = (uniq % (X * Y * Z)).astype(np.int64)

    def unflat(g):
        z = g % Z
        y = (g // Z) % Y
        x = g // (Z * Y)
        return np.stack([x, y, z], -1)

    plo = unflat(ulo).astype(np.float32)
    phi = unflat(uhi).astype(np.float32)
    vlo = sdf[tuple(unflat(ulo).T)]
    vhi = sdf[tuple(unflat(uhi).T)]
    t = (level - vlo) / np.where(np.abs(vhi - vlo) > 1e-12, vhi - vlo, 1.0)
    t = np.clip(t, 0.0, 1.0)[:, None]
    verts = plo + t * (phi - plo)

    # drop degenerate faces (repeated vertices)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "wb") as f:
        head = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n")
        f.write(head.encode())
        f.write(verts.astype("<f4").tobytes())
        rec = np.empty(len(faces),
                       dtype=[("n", "u1"), ("v", "<i4", (3,))])
        rec["n"] = 3
        rec["v"] = faces
        f.write(rec.tobytes())

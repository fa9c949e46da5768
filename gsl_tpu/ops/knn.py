"""Chunked brute-force k-nearest-neighbor distances (pure JAX).

TPU-native replacement for the `simple-knn` CUDA extension's `distCUDA2`
(/root/reference/internal/models/vanilla_gaussian.py:123-124): mean squared
distance to the 3 nearest neighbors, used once at init for initial scales.
Brute force over chunks is fine on TPU (one-time cost; the distance matrix
chunk is an MXU matmul).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_sq_dist_to_knn(points: jnp.ndarray, k: int = 3,
                        chunk: int = 512) -> jnp.ndarray:
    """points [N, 3] -> [N] mean squared distance to the k nearest neighbors
    (excluding self)."""
    n = points.shape[0]
    if n <= 1:
        return jnp.full((n,), 1e-4, points.dtype)
    k_eff = min(k + 1, n)
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(points * points, axis=-1)  # [N]

    def body(_, q):  # q: [chunk, 3]
        d2 = (jnp.sum(q * q, axis=-1)[:, None] + sq[None, :]
              - 2.0 * (q @ points.T))  # [chunk, N]
        d2 = jnp.maximum(d2, 0.0)
        # drop self-distance (the zero entry) by taking k+1 smallest
        neg_top, _ = jax.lax.top_k(-d2, k_eff)
        knn = -neg_top[:, 1:]  # [chunk, k_eff-1]
        return None, jnp.mean(knn, axis=-1)

    _, out = jax.lax.scan(body, None, pts.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def knn_indices(queries: jnp.ndarray, points: jnp.ndarray, k: int,
                chunk: int = 512):
    """queries [M, 3] -> (idx [M, k], d2 [M, k]) nearest `points` rows
    (pytorch3d knn_points analogue; chunked MXU distance matmuls)."""
    m = queries.shape[0]
    pad = (-m) % chunk
    q_all = jnp.pad(queries, ((0, pad), (0, 0)))
    sq = jnp.sum(points * points, axis=-1)

    def body(_, q):
        d2 = (jnp.sum(q * q, axis=-1)[:, None] + sq[None, :]
              - 2.0 * (q @ points.T))
        d2 = jnp.maximum(d2, 0.0)
        neg_top, idx = jax.lax.top_k(-d2, k)
        return None, (idx, -neg_top)

    _, (idx, d2) = jax.lax.scan(body, None, q_all.reshape(-1, chunk, 3))
    return (idx.reshape(-1, k)[:m], d2.reshape(-1, k)[:m])

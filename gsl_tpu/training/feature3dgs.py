"""Feature 3DGS: per-gaussian semantic feature field distillation.

TPU-native redesign of the reference Feature3DGSRenderer + metrics
(/root/reference/internal/renderers/feature_3dgs_renderer.py:31-467,
internal/metrics/feature_3dgs_metrics.py): a frozen trained scene gains a
per-gaussian feature vector; rendered feature maps (alpha-composited
through the same rasterizer) are distilled against teacher maps (SAM /
LSeg encoder outputs) with an L1 loss. `speedup` halves the stored
feature width and a 1x1 conv decoder restores the teacher dimensionality
(feature_3dgs_renderer.py:21-29). CLIP text querying reduces to the
selection-score math over encoded text embeddings
(feature_3dgs_renderer.py:432-449) — text encoding itself happens offline
(tools/encode_clip_queries.py) since this runtime ships no CLIP weights.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gaussian import GaussianState
from .segany import render_features


@dataclasses.dataclass
class Feature3DGSConfig:
    n_feature_dims: int = 128          # teacher dims (SAM 256, LSeg 512)
    speedup: bool = False              # store half dims + 1x1 conv decoder
    feature_lr: float = 1e-3
    feature_decoder_lr: float = 1e-4
    isect_capacity: int = 1 << 18

    @property
    def actual_dims(self) -> int:
        return self.n_feature_dims // 2 if self.speedup \
            else self.n_feature_dims

    def instantiate(self):
        return self


def init_feature_state(key: jax.Array, capacity: int,
                       cfg: Feature3DGSConfig):
    d = cfg.actual_dims
    params = {"features": jnp.zeros((capacity, d), jnp.float32)}
    if cfg.speedup:
        k = jax.random.split(key, 1)[0]
        params["dec_w"] = jax.random.normal(
            k, (d, cfg.n_feature_dims), jnp.float32) / np.sqrt(d)
        params["dec_b"] = jnp.zeros((cfg.n_feature_dims,), jnp.float32)
    return params


def decode_features(params, fmap: jnp.ndarray) -> jnp.ndarray:
    """[H, W, D_actual] -> [H, W, n_feature_dims] (1x1 conv == matmul)."""
    if "dec_w" not in params:
        return fmap
    return fmap @ params["dec_w"] + params["dec_b"]


def build_optimizer(cfg: Feature3DGSConfig):
    if cfg.speedup:
        return optax.multi_transform(
            {"features": optax.adam(cfg.feature_lr),
             "decoder": optax.adam(cfg.feature_decoder_lr)},
            {"features": "features", "dec_w": "decoder",
             "dec_b": "decoder"})
    return optax.adam(cfg.feature_lr)


class Feature3DGSTrainer:
    """Distills teacher feature maps into per-gaussian features on a
    FROZEN scene (geometry/appearance stop-gradient)."""

    def __init__(self, cfg: Feature3DGSConfig, scene: GaussianState):
        self.cfg = cfg
        self.scene = scene
        self.tx = build_optimizer(cfg)

    def init(self, key: jax.Array):
        params = init_feature_state(key, self.scene.capacity, self.cfg)
        return params, self.tx, self.tx.init(params)

    def make_train_step(self, img_height: int, img_width: int):
        cfg = self.cfg
        scene = self.scene

        @jax.jit
        def step(params, opt_state, camera, gt_feature_map):
            """gt_feature_map [h, w, n_feature_dims] (any resolution — the
            rendered map is resized to it, feature_3dgs_metrics.py:23)."""
            def loss_fn(p):
                fmap, _ = render_features(
                    scene, p["features"], camera, img_height, img_width,
                    isect_capacity=cfg.isect_capacity)
                fmap = decode_features(p, fmap)
                fmap = jax.image.resize(
                    fmap, (gt_feature_map.shape[0], gt_feature_map.shape[1],
                           fmap.shape[-1]), "bilinear")
                return jnp.mean(jnp.abs(fmap - gt_feature_map))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return params, new_opt, loss

        return step


def selection_score(features: jnp.ndarray, query_features: jnp.ndarray,
                    score_threshold: Optional[float] = None,
                    positive_ids=(0,)) -> jnp.ndarray:
    """Per-gaussian query score (feature_3dgs_renderer.py:432-449).

    features [N, D] (per-gaussian, decoded); query_features [Q, D] encoded
    text embeddings. One query: cosine sim mapped to [0,1], thresholded.
    Multiple: softmax over queries; positives either sum-thresholded or
    argmax-membership."""
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-9)
    q = query_features / jnp.maximum(
        jnp.linalg.norm(query_features, axis=-1, keepdims=True), 1e-9)
    scores = f @ q.T                                       # [N, Q]
    pos = jnp.asarray(positive_ids)
    if scores.shape[-1] == 1:
        s = (scores[:, 0] + 1.0) / 2.0
        thr = 0.5 if score_threshold is None else score_threshold
        return (s >= thr).astype(jnp.float32)
    soft = jax.nn.softmax(scores, axis=-1)
    pos_sum = jnp.sum(soft[:, pos], axis=-1)
    if score_threshold is not None:
        return (pos_sum >= score_threshold).astype(jnp.float32)
    amended = soft.at[:, pos[0]].set(pos_sum)
    return jnp.isin(jnp.argmax(amended, axis=-1), pos).astype(jnp.float32)


def query_edit_mask(params, query_features, **kw) -> jnp.ndarray:
    """Per-gaussian keep-mask for text-driven extraction/deletion: decoded
    per-gaussian features scored against the query."""
    feats = params["features"]
    if "dec_w" in params:
        feats = feats @ params["dec_w"] + params["dec_b"]
    return selection_score(feats, query_features, **kw)

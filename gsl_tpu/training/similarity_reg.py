"""Appearance-feature kNN similarity regularization.

Parity with the reference VanillaMetricsWithSimilarityRegularization
(/root/reference/internal/metrics/
appearance_feature_similarity_regularization_metrics.py:12-126): every
`similarity_reg_interval` steps, sample gaussians, find their k nearest
neighbors (pytorch3d knn_points -> ops/knn.knn_indices), and penalize
feature dissimilarity within each neighborhood, weighted by
exp(-decay * distance). Applied as a standalone gradient step on the
appearance features (the reference runs a second manual_backward)."""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops.knn import knn_indices


@dataclasses.dataclass
class SimilarityRegConfig:
    n_appearance_samples: int = 20_480
    n_appearance_nn: int = 16
    distance_weight_decay: float = 200.0
    similarity_reg_from: int = 0
    similarity_reg_lambda: float = 0.2
    similarity_reg_interval: int = 50
    similarity_type: str = "cosine"      # "cosine" | "euclidean"

    def instantiate(self):
        return self


def similarity_loss(cfg: SimilarityRegConfig, means, features, alive,
                    key: jax.Array) -> jnp.ndarray:
    """-lambda * weighted mean pairwise similarity over sampled kNN
    neighborhoods (upper triangle, excluding self pairs)."""
    cap = means.shape[0]
    n_s = min(cfg.n_appearance_samples, cap)
    # sample alive gaussians (dead ones are pushed far away so their
    # neighborhoods never mix with real ones)
    far = jnp.where(alive[:, None], means,
                    jnp.float32(1e6) + jnp.arange(cap, dtype=jnp.float32
                                                  )[:, None])
    sample = jax.random.choice(key, cap, (n_s,), replace=False)
    # kNN + distance weights carry no gradient (reference computes them
    # under torch.no_grad(), appearance_feature_similarity_regularization_
    # metrics.py:65-77) — only the features are regularized
    far = jax.lax.stop_gradient(far)
    idx, d2 = knn_indices(far[sample], far, cfg.n_appearance_nn)
    w = jnp.exp(-cfg.distance_weight_decay * d2)          # [S, K]
    feats = features[idx]                                  # [S, K, D]
    if cfg.similarity_type == "cosine":
        f = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
        sim = jnp.einsum("skd,sld->skl", f, f)
    else:
        # safe L2: linalg.norm's VJP is NaN at zero distance, and the
        # diagonal (k == l) is EXACTLY zero — the triu mask only zeroes
        # the loss term, not the NaN riding the masked cotangent
        diff = feats[:, :, None] - feats[:, None, :]
        sim = -jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-18))
    reg = -sim * w[:, None, :]                             # [S, K, K]
    k = cfg.n_appearance_nn
    triu = jnp.triu(jnp.ones((k, k), bool), 1)
    valid = jnp.where(triu[None], reg, 0.0)
    return (jnp.sum(valid) / jnp.maximum(triu.sum() * n_s, 1)
            ) * cfg.similarity_reg_lambda


def make_similarity_reg_step(cfg: SimilarityRegConfig, tx):
    """Standalone jitted step applying the regularizer's gradient to the
    appearance features through the gaussian optimizer.

    Only the `appearance_features` leaf is touched: a naive tx.update with
    zero grads elsewhere would still decay every other leaf's Adam moments
    (mu *= b1) and advance its schedule count — a dynamics perturbation the
    reference's separate manual_backward does not have. The update is
    masked to the target leaf and the optimizer state of every other
    multi_transform label is restored afterwards (keeping the per-row Adam
    moments inside the MAIN optimizer state so densification surgery still
    maintains them)."""
    from jax.tree_util import tree_map_with_path

    @jax.jit
    def step(state, key):
        def loss_fn(params):
            return similarity_loss(cfg, params.means,
                                   params.appearance_features,
                                   state.alive, key)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        masked = jax.tree.map(jnp.zeros_like, updates)
        masked = masked.replace(
            appearance_features=updates.appearance_features)
        params = jax.tree.map(lambda a, u: a + u, state.params, masked)

        def restore(path, new_leaf, old_leaf):
            names = [str(getattr(k, "key", getattr(k, "name", "")))
                     for k in path]
            return (new_leaf if "appearance_features" in names
                    else old_leaf)

        opt_state = tree_map_with_path(restore, new_opt, state.opt_state)
        return state.replace(params=params, opt_state=opt_state), loss

    return step

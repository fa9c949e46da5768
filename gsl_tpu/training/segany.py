"""Segment-Anything 3D feature distillation (SegAnySplatting / SAGA).

Capability parity with /root/reference/internal/segany_splatting.py:23-491
and /root/reference/internal/renderers/seganygs_renderer.py: per-Gaussian
contrastive features trained on a FROZEN scene by rendering feature maps and
pulling/pushing sampled pixel pairs according to SAM masks, with scale-gated
features and mask-size re-weighting (Appendix A.1 of SAGA).

Scoped differences from the reference (documented deliberately):
- the scale gate is a smooth sigmoid gate over feature dims driven by the
  normalized mask scale (the reference additionally offers a quantile
  transformer fit over the dataset's mask scales),
- the correspondence loss uses sampled-pixel cosine similarity with
  same-mask / different-mask targets and per-pixel mean-mask-size
  re-weighting; the reference's multi-scale sampling loop is folded into a
  single scale draw per step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..data.cameras import Cameras
from ..models.gaussian import GaussianState
from ..ops.rasterize_jax import rasterize_tiles
from ..ops.tiling import isect_encode
from ..ops.projection import project_gaussians


@dataclasses.dataclass
class SegAnyConfig:
    feature_dims: int = 32
    scale_aware: bool = True
    n_sampled_pixels: int = 1024
    feature_lr: float = 5e-3
    smooth_k: int = 16

    def instantiate(self):
        return self


def init_features(key: jax.Array, capacity: int, dims: int) -> jnp.ndarray:
    return jax.random.normal(key, (capacity, dims), jnp.float32) * 0.02


def scale_gate(features: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Scale-conditioned gating: larger query scales progressively enable
    higher feature dims (smooth version of the reference's fixed_scale_gate,
    segany_splatting.py:144-151)."""
    d = features.shape[-1]
    idx = jnp.arange(d, dtype=jnp.float32) / d
    gate = jax.nn.sigmoid((scale - idx) * 16.0)
    return features * gate


def render_features(gstate: GaussianState, features: jnp.ndarray,
                    camera: Cameras, img_height: int, img_width: int,
                    tile_size: int = 16, isect_capacity: int = 1 << 18,
                    max_per_tile: int = 1024, chunk: int = 64):
    """Render per-pixel features [H, W, D] with frozen geometry."""
    proj = project_gaussians(
        jax.lax.stop_gradient(gstate.get_means()),
        jax.lax.stop_gradient(gstate.get_scales()),
        jax.lax.stop_gradient(gstate.get_rotations()),
        camera.world_to_camera, camera.fx, camera.fy, camera.cx, camera.cy,
        img_width, img_height)
    op = jax.lax.stop_gradient(gstate.get_opacities() * proj.compensations)
    isects = isect_encode(proj, img_height, img_width, tile_size,
                          isect_capacity)
    fmap, alpha = rasterize_tiles(
        proj.means2d, proj.conics, op, features, isects,
        img_height, img_width, tile_size=tile_size,
        max_per_tile=max_per_tile, chunk=chunk)
    return fmap, alpha


def correspondence_loss(key: jax.Array, feature_map: jnp.ndarray,
                        sam_masks: jnp.ndarray, mask_scales: jnp.ndarray,
                        n_samples: int = 1024,
                        scale: jnp.ndarray = None) -> jnp.ndarray:
    """feature_map [H, W, D]; sam_masks [M, H, W] bool; mask_scales [M].

    Pulls features of same-mask pixel pairs together (cosine sim -> 1) and
    pushes different-mask pairs apart, re-weighted by per-pixel mean mask
    size (SAGA Appendix A.1)."""
    H, W, D = feature_map.shape
    M = sam_masks.shape[0]
    masks_f = sam_masks.astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    ys = jax.random.randint(k1, (n_samples,), 0, H)
    xs = jax.random.randint(k2, (n_samples,), 0, W)
    feats = feature_map[ys, xs]                      # [S, D]
    if scale is not None:
        feats = scale_gate(feats, scale)
    # eps inside the sqrt: norm-gradient at zero features must stay finite
    feats = feats * jax.lax.rsqrt(
        jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-8)
    pix_masks = masks_f[:, ys, xs].T                 # [S, M]

    masked_at_all = pix_masks.sum(-1) > 0

    # same-mask indicator for pixel pairs: share at least one mask
    share = (pix_masks @ pix_masks.T) > 0            # [S, S]
    sim = feats @ feats.T                            # [S, S] cosine

    # re-weighting: 1 / mean mask size at the pixel
    mask_sizes = masks_f.sum(axis=(1, 2))            # [M]
    per_pix_mean_size = (pix_masks @ mask_sizes) / jnp.maximum(
        pix_masks.sum(-1), 1e-9)                     # [S]
    wgt = 1.0 / jnp.sqrt(jnp.maximum(per_pix_mean_size, 1.0))
    pair_w = (wgt[:, None] * wgt[None, :]
              * (masked_at_all[:, None] & masked_at_all[None, :]))

    pull = (1.0 - sim) * share
    push = jnp.maximum(sim - 0.5, 0.0) * (~share)
    return jnp.sum((pull + push) * pair_w) / jnp.maximum(
        jnp.sum(pair_w), 1e-8)


@dataclasses.dataclass
class SegAnyTrainer:
    """Distill features on a frozen scene (second-stage training)."""

    config: SegAnyConfig
    gstate: GaussianState

    def init(self, key: jax.Array):
        import optax

        features = init_features(key, self.gstate.capacity,
                                 self.config.feature_dims)
        tx = optax.adam(self.config.feature_lr)
        return features, tx, tx.init(features)

    def make_train_step(self, tx, img_height: int, img_width: int,
                        **render_kwargs):
        cfg = self.config
        gstate = self.gstate

        @jax.jit
        def step(features, opt_state, key, camera, sam_masks, mask_scales,
                 query_scale):
            def loss_fn(feats):
                fmap, _ = render_features(gstate, feats, camera, img_height,
                                          img_width, **render_kwargs)
                return correspondence_loss(
                    key, fmap, sam_masks, mask_scales,
                    n_samples=cfg.n_sampled_pixels,
                    scale=query_scale if cfg.scale_aware else None)

            loss, grads = jax.value_and_grad(loss_fn)(features)
            updates, opt_state = tx.update(grads, opt_state, features)
            import optax
            features = optax.apply_updates(features, updates)
            return features, opt_state, loss

        return step

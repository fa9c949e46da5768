"""SpotLessSplats: robust masking of transient distractors.

TPU-native redesign of the reference SpotLessMetrics
(/root/reference/internal/metrics/spotless_metrics.py:15-475): a tiny MLP
over Stable-Diffusion features + positional encodings predicts a per-pixel
inlier mask; the photometric loss is gated by a Bernoulli sample of that
mask (scheduled from all-ones), while the MLP itself is supervised by
upper/lower robust-threshold masks derived from a running error histogram.
The reference's alternating optimization (second manual_backward for the
MLP) collapses here into ONE jitted step: the two losses are added and the
gradient partitions itself because the mask is stop-gradient in the
photometric term and the rendered error is stop-gradient in the MLP term.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.cameras import Cameras
from ..models.gaussian import GaussianState
from ..ops.ssim import ssim as ssim_fn
from .metrics import VanillaMetricsConfig
from .trainer import Trainer, TrainState
from .density import update_stats
from ..renderers.tile_renderer import viewspace_grad_scale


@dataclasses.dataclass
class SpotLessMetricsConfig(VanillaMetricsConfig):
    lower_bound: float = 0.5
    upper_bound: float = 0.9
    bin_size: int = 10000
    schedule: bool = True
    schedule_beta: float = -3e-3
    reset_sh: int = 8002
    robust_percentile: float = 0.7
    max_mlp_mask_size: int = 800
    densify_until_iter: int = 15_000
    n_feature_dims: int = 1280
    mlp_lr: float = 1e-3

    def instantiate(self):
        return self


def init_spotless_state(rng: jax.Array, cfg: SpotLessMetricsConfig):
    """hist + MLP (F+80 -> 16 -> 1 sigmoid, spotless_metrics.py:18-29) +
    its Adam state, as a checkpointable pytree."""
    f = cfg.n_feature_dims + 80
    k1, k2 = jax.random.split(rng)
    params = {
        "w1": jax.random.normal(k1, (f, 16), jnp.float32) / np.sqrt(f),
        "b1": jnp.zeros((16,), jnp.float32),
        "w2": jax.random.normal(k2, (16, 1), jnp.float32) / 4.0,
        "b2": jnp.zeros((1,), jnp.float32),
    }
    tx = optax.adam(cfg.mlp_lr)
    return {"hist": jnp.zeros((cfg.bin_size,), jnp.float32),
            "mlp": params, "opt": tx.init(params)}


def positional_encodings(height: int, width: int, n_freq: int = 20):
    """[H, W, 4*n_freq] sin/cos grid (spotless_metrics.py:432-475)."""
    y = jnp.linspace(0.0, 1.0, height)[:, None, None]
    x = jnp.linspace(0.0, 1.0, width)[None, :, None]
    freqs = (2.0 ** jnp.arange(n_freq)) * jnp.pi
    ye = jnp.concatenate([jnp.sin(freqs * y), jnp.cos(freqs * y)], -1)
    xe = jnp.concatenate([jnp.sin(freqs * x), jnp.cos(freqs * x)], -1)
    ye = jnp.broadcast_to(ye, (height, width, 2 * n_freq))
    xe = jnp.broadcast_to(xe, (height, width, 2 * n_freq))
    return jnp.concatenate([ye, xe], -1)


def robust_mask(err: jnp.ndarray, threshold) -> jnp.ndarray:
    """err [H, W] -> {0,1} inlier mask with 3x3 inlier-neighbor dilation
    (spotless_metrics.py:404-429)."""
    inlier = (err < threshold).astype(jnp.float32)
    k = jnp.ones((3, 3), jnp.float32) / 9.0
    neigh = jax.scipy.signal.convolve2d(inlier, k, mode="same")
    return (((neigh > 0.5).astype(jnp.float32) + inlier) > 1e-3
            ).astype(jnp.float32)


def _mlp_apply(p, x):
    h = jax.nn.relu(x @ p["w1"] + p["b1"])
    return jax.nn.sigmoid(h @ p["w2"] + p["b2"])


def _hist_quantile(hist, q):
    cum = jnp.cumsum(hist)
    total = jnp.maximum(cum[-1], 1e-9)
    idx = jnp.argmax(cum >= total * q)
    return idx.astype(jnp.float32) / hist.shape[0]


def make_spotless_step(trainer: Trainer, cfg: SpotLessMetricsConfig):
    """Returns a jitted step(state, camera, gt, sd_feature, bg, key, mask,
    ...) -> (state, scalars). One backward updates gaussians, density
    stats, and the mask MLP together."""
    tx_mlp = optax.adam(cfg.mlp_lr)

    @functools.partial(jax.jit, static_argnames=(
        "img_height", "img_width", "sh_degree", "isect_capacity"))
    def step(state: TrainState, camera: Cameras, gt_image, sd_feature,
             bg_color, key, img_height: int, img_width: int,
             sh_degree: int, mask=None, isect_capacity=None):
        sls = state.extra["__spotless__"]
        gauss_extra = {k: v for k, v in state.extra.items()
                       if k != "__spotless__"} or None
        H, W = img_height, img_width
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)

        lower_thr = _hist_quantile(sls["hist"], cfg.lower_bound)
        upper_thr = _hist_quantile(sls["hist"], cfg.upper_bound)
        mh = min(H, cfg.max_mlp_mask_size)
        mw = min(W, cfg.max_mlp_mask_size)
        pe = positional_encodings(mh, mw)

        def loss_fn(params, tap, mlp):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=gauss_extra)
            out = trainer.renderer.forward(
                gstate, camera, H, W, bg_color, sh_degree,
                means2d_tap=tap, isect_capacity=isect_capacity)
            render = out.render
            err3 = jnp.abs(render - gt_image)
            err = jax.lax.stop_gradient(jnp.mean(err3, -1))
            if mask is not None:
                # padded/masked pixels compare rendered content against a
                # zero GT, producing fake errors — exclude them from the
                # histogram and robust-mask supervision
                err = err * mask

            sf = jax.image.resize(sd_feature, (sd_feature.shape[0], mh, mw),
                                  "bilinear")
            feats = jnp.concatenate(
                [jnp.transpose(sf, (1, 2, 0)), pe], -1).reshape(mh * mw, -1)
            pred_small = _mlp_apply(mlp, feats).reshape(1, mh, mw)
            pred = jax.image.resize(pred_small, (1, H, W), "bilinear")[0]

            lower_m = robust_mask(err, lower_thr)
            upper_m = robust_mask(err, upper_thr)
            sup = jax.nn.relu(pred - upper_m) + jax.nn.relu(lower_m - pred)
            if mask is not None:
                mlp_loss = jnp.sum(sup * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0)
            else:
                mlp_loss = jnp.mean(sup)
            mlp_loss = mlp_loss + 0.5 * (jnp.max(jnp.abs(mlp["w1"]))
                                         * jnp.max(jnp.abs(mlp["w2"])))

            pred_d = jax.lax.stop_gradient(pred)
            if cfg.schedule:
                alpha = jnp.exp(cfg.schedule_beta
                                * jnp.floor((1.0 + state.step) / 1.5))
                p_keep = jnp.clip(alpha + (1 - alpha) * pred_d, 0.0, 1.0)
                keep = jax.random.bernoulli(key, p_keep).astype(jnp.float32)
            else:
                keep = pred_d
            if mask is not None:
                keep = keep * mask

            l1 = jnp.mean(keep[..., None] * err3)
            sls_m = (keep * (keep > 0.5))[..., None]
            s = ssim_fn((render * sls_m).transpose(2, 0, 1),
                        (gt_image * sls_m).transpose(2, 0, 1))
            loss = ((1.0 - cfg.lambda_dssim) * l1
                    + cfg.lambda_dssim * (1.0 - s))
            if cfg.opacity_reg > 0.0:
                n_alive = jnp.maximum(
                    jnp.sum(state.alive.astype(jnp.float32)), 1.0)
                loss = loss + cfg.opacity_reg * jnp.sum(
                    jax.nn.sigmoid(params.opacities[:, 0])
                    * state.alive) / n_alive
            total = loss + mlp_loss
            scalars = {"loss": loss, "spot": mlp_loss, "l1": l1, "ssim": s,
                       "mask_mean": jnp.mean(pred_d)}
            return total, (scalars, out.radii, out.n_dropped, err)

        (_, (scalars, radii, n_dropped, err)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                state.params, tap0, sls["mlp"])
        pgrads, tap_grad, mlp_grads = grads

        gscale = viewspace_grad_scale(
            W, H, trainer.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        updates, opt_state = trainer.tx.update(pgrads, state.opt_state,
                                               state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        mlp_updates, mlp_opt = tx_mlp.update(mlp_grads, sls["opt"],
                                             sls["mlp"])
        mlp = jax.tree.map(lambda p, u: p + u, sls["mlp"], mlp_updates)

        # running error histogram (0.95 decay, densify window only);
        # padded pixels contribute weight 0 so they cannot skew quantiles
        idx = jnp.clip((err * cfg.bin_size).astype(jnp.int32), 0,
                       cfg.bin_size - 1)
        hist_w = (jnp.ones_like(err) if mask is None else mask).reshape(-1)
        hist_add = jnp.zeros((cfg.bin_size,), jnp.float32).at[
            idx.reshape(-1)].add(hist_w)
        update_hist = state.step < cfg.densify_until_iter
        hist = jnp.where(update_hist, 0.95 * sls["hist"] + hist_add,
                         sls["hist"])

        extra = dict(state.extra,
                     __spotless__={"hist": hist, "mlp": mlp,
                                   "opt": mlp_opt})
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

    return step


def reset_shs_rest(state: TrainState, max_val: float = 0.001) -> TrainState:
    """One-time specular reset (spotless_metrics.py reset_shs_rest at step
    `reset_sh`): clamp shs_rest and zero its Adam moments (path-targeted,
    same discipline as zero_opacity_opt_state)."""
    from jax.tree_util import tree_map_with_path

    params = state.params.replace(
        shs_rest=jnp.minimum(state.params.shs_rest, max_val))
    target_shape = tuple(state.params.shs_rest.shape)

    def fix(path, leaf):
        if not (isinstance(leaf, jnp.ndarray)
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.shape == target_shape):
            return leaf
        names = [str(getattr(k, "key", getattr(k, "name", "")))
                 for k in path]
        if any(n == "shs_rest" for n in names):
            return jnp.zeros_like(leaf)
        return leaf

    opt_state = tree_map_with_path(fix, state.opt_state)
    return TrainState(params=params, alive=state.alive,
                      opt_state=opt_state, density=state.density,
                      step=state.step, extra=state.extra)

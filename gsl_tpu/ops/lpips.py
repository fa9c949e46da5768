"""LPIPS (alex) in pure JAX.

TPU-native replacement for the reference's torchmetrics LPIPS validation
metric (/root/reference/internal/metrics/vanilla_metrics.py:90-115). The
backbone (AlexNet features) and the per-tap linear heads are implemented
directly with lax.conv; pretrained weights are loaded from a local `.npz`
(this environment has no network egress, so weights cannot be fetched at
runtime — export them once with `tools/export_lpips_weights.py` on a
machine that has torchvision/torchmetrics installed).

Weight file format (all float32, torch OIHW conv layout):
  features.{0,3,6,8,10}.weight / .bias   — AlexNet conv kernels
  lin.{0..4}.weight                      — 1x1 LPIPS heads [1, C, 1, 1]

Search path: $GSL_LPIPS_WEIGHTS, then <repo>/weights/lpips_alex.npz.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# input normalization (lpips.ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features config: (out_ch, kernel, stride, pad), maxpool after 0,1
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}


def default_weights_path() -> str:
    env = os.environ.get("GSL_LPIPS_WEIGHTS")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "weights", "lpips_alex.npz")


def load_weights(path: Optional[str] = None):
    """Returns the weight dict or None when the file is absent."""
    path = path or default_weights_path()
    if not os.path.exists(path):
        return None
    z = np.load(path)
    keys = [f"features.{i}.weight" for i in (0, 3, 6, 8, 10)]
    keys += [f"features.{i}.bias" for i in (0, 3, 6, 8, 10)]
    keys += [f"lin.{i}.weight" for i in range(5)]
    if not all(k in z for k in keys):
        raise ValueError(f"LPIPS weight file {path} is missing keys")
    return {k: jnp.asarray(z[k]) for k in keys}


def _conv(x, w, b, stride, pad):
    # x [N, C, H, W]; w torch OIHW
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                             (1, 1, 2, 2), "VALID")


def _features(x, w):
    taps = []
    idxs = (0, 3, 6, 8, 10)
    for i, (oc, k, s, p) in enumerate(_CONVS):
        x = _conv(x, w[f"features.{idxs[i]}.weight"],
                  w[f"features.{idxs[i]}.bias"], s, p)
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return taps


def lpips(img0: jnp.ndarray, img1: jnp.ndarray, weights) -> jnp.ndarray:
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    def prep(img):
        x = img.transpose(2, 0, 1)[None] * 2.0 - 1.0      # [1, 3, H, W]
        return (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
            / jnp.asarray(_SCALE)[None, :, None, None]

    t0 = _features(prep(img0), weights)
    t1 = _features(prep(img1), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                                 # [1, C, H, W]
        lin = weights[f"lin.{i}.weight"][:, :, 0, 0]       # [1, C]
        total = total + jnp.mean(
            jnp.einsum("nchw,oc->nohw", d, lin), axis=(1, 2, 3))
    return total[0]


@functools.lru_cache(maxsize=1)
def get_lpips_fn(path: Optional[str] = None):
    """(jitted_fn | None). None when no local weights are available."""
    w = load_weights(path)
    if w is None:
        return None
    return jax.jit(functools.partial(lpips, weights=w))

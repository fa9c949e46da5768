"""SSIM with 11x11 Gaussian window (pure JAX; XLA fuses the convs).

Math parity with the reference Inria SSIM
(/root/reference/internal/utils/ssim.py:24-64): window sigma 1.5,
C1 = 0.01^2, C2 = 0.03^2, same-padding, mean over all pixels/channels.
The separable window makes each conv a pair of small depthwise convs, which
XLA maps well to TPU. Replaces the `fused-ssim` CUDA extension (SURVEY §2.3 N7).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable same-padded gaussian blur. img [C, H, W]."""
    c = img.shape[0]
    size = win.shape[0]
    x = img[None]  # [1, C, H, W]
    kh = jnp.tile(win.reshape(1, 1, size, 1), (c, 1, 1, 1))
    kw = jnp.tile(win.reshape(1, 1, 1, size), (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = size // 2
    x = lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=c)
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """SSIM between two images [C, H, W] (or [H, W, C] -> pass channels_last).

    Returns scalar mean SSIM.
    """
    win = _gaussian_window(window_size, sigma)
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12
    ssim_map = ((2.0 * mu12 + _C1) * (2.0 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2))
    return jnp.mean(ssim_map)

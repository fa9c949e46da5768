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


def _band_matrix(n: int, win: jnp.ndarray) -> jnp.ndarray:
    """[n, n] banded same-padding blur matrix: B[i, j] = win[i - j + r]
    for |i - j| <= r (zero boundary = conv's zero padding)."""
    size = win.shape[0]
    r = size // 2
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    d = i - j + r
    inside = (d >= 0) & (d < size)
    return jnp.where(inside, win[jnp.clip(d, 0, size - 1)], 0.0)


def _blur_mxu(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable blur as banded MXU matmuls. img [C, H, W].

    TPU depthwise convs lower to the VPU (measured ~20 ms fwd for the five
    SSIM blurs at 2MP); a dense banded matmul per axis rides the MXU
    instead (~10x). The band is split hi+lo bf16 (exact to ~16 bits) and
    the image truncates to bf16 in the product — a 2^-9 relative rounding
    on the blur, far below the DSSIM term's contribution to the training
    signal. Exact mode keeps the conv path.
    """
    c, h, w = img.shape
    bw = _band_matrix(w, win)
    bh = _band_matrix(h, win)

    def split_mm(x, b):
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # explicit DEFAULT: bf16 operands reject a global highest override
        return (jnp.dot(x, b_hi, preferred_element_type=jnp.float32,
                        precision=lax.Precision.DEFAULT)
                + jnp.dot(x, b_lo, preferred_element_type=jnp.float32,
                          precision=lax.Precision.DEFAULT))

    # along W: [C*H, W] @ B_W  (B[i,j] column j sums win over inputs i)
    x = split_mm(img.reshape(c * h, w), bw).reshape(c, h, w)
    # along H: contract H with B_H -> [C, W, H] -> back to [C, H, W]
    bh_hi = bh.astype(jnp.bfloat16)
    bh_lo = (bh - bh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y = (lax.dot_general(x, bh_hi, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.DEFAULT)
         + lax.dot_general(x, bh_lo, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.DEFAULT))
    return y.transpose(0, 2, 1)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, fast: bool = False) -> jnp.ndarray:
    """SSIM between two images [C, H, W] (or [H, W, C] -> pass channels_last).

    `fast=True` computes the five separable blurs as banded MXU matmuls
    (bf16-rounded, ~2^-9 relative — use for the training loss); the
    default conv path is exact f32 (use for reported metrics).

    Returns scalar mean SSIM.
    """
    win = _gaussian_window(window_size, sigma)
    blur = (lambda x: _blur_mxu(x, win)) if fast else \
        (lambda x: _blur(x, win))
    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu12
    if fast:
        # The banded-MXU blurs carry an ABSOLUTE ~2^-9*|img^2| rounding on
        # blur(img^2) (TPU MXU operand truncation), so the variance
        # difference can land below -C2 in near-flat windows — flipping
        # the denominator sign and breaking the SSIM <= 1 bound (observed
        # as an impossible negative train loss in the round-4 quality
        # run, VERDICT r4 weak #5). Restore the exact path's invariants:
        # variances >= 0 and |sigma12| <~ sigma1*sigma2 (Cauchy-Schwarz).
        # The projection bound is inflated by an absolute 1e-6 so it can
        # only bind on REAL violations (~1e-3 class): in benign flat
        # windows sigma12 ~ +-ulp and the clamp must stay inactive, or
        # its gradient discontinuity makes dL/dimg depend on last-ulp
        # reduction order (the sigma12 chain has gain ~2/C2 there).
        # stop_gradient on the bound: a binding clamp means the
        # covariance estimate is rounding noise.
        sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
        sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
        bound = lax.stop_gradient(
            jnp.sqrt(sigma1_sq * sigma2_sq)) + 1e-6
        sigma12 = jnp.clip(sigma12, -bound, bound)
    ssim_map = ((2.0 * mu12 + _C1) * (2.0 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2))
    m = jnp.mean(ssim_map)
    if fast:
        # the epsilon-inflated bound admits up to ~+2e-3 per fully
        # degenerate window; cap the MEAN at 1 (pass-through where <= 1)
        # so 1 - ssim — and the train loss — stays >= 0 exactly
        m = jnp.where(m > 1.0, 1.0, m)
    return m

"""Training/eval metrics.

Parity with the reference VanillaMetrics
(/root/reference/internal/metrics/vanilla_metrics.py:12-115): train loss =
(1 - lambda) * L1 + lambda * (1 - SSIM), lambda = 0.2, with masked pixels
zeroed in both prediction and GT before the loss; validation adds PSNR.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..ops.ssim import ssim


@dataclasses.dataclass
class VanillaMetricsConfig:
    lambda_dssim: float = 0.2
    rgb_diff_loss: str = "l1"  # "l1" | "l2"
    # MCMC regularizers (reference mcmc_metrics.py:28-66); 0 disables
    opacity_reg: float = 0.0
    scale_reg: float = 0.0

    def instantiate(self):
        return self


@dataclasses.dataclass
class MCMCMetricsConfig(VanillaMetricsConfig):
    opacity_reg: float = 0.01
    scale_reg: float = 0.01


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def train_loss(pred_hwc: jnp.ndarray, gt_hwc: jnp.ndarray,
               mask_hw: Optional[jnp.ndarray] = None,
               lambda_dssim: float = 0.2, rgb_diff_loss: str = "l1"):
    """Returns (loss, dict of scalars). Inputs [H, W, 3]."""
    if mask_hw is not None:
        m = mask_hw[..., None]
        pred_hwc = pred_hwc * m
        gt_hwc = gt_hwc * m
    if rgb_diff_loss == "l2":
        rgb_loss = jnp.mean((pred_hwc - gt_hwc) ** 2)
    else:
        rgb_loss = jnp.mean(jnp.abs(pred_hwc - gt_hwc))
    # fast=True: banded-MXU blurs (2^-9 rounding class) — this SSIM drives
    # the 0.2-weighted DSSIM training term; reported/validation SSIM uses
    # the exact conv path
    ssim_val = ssim(pred_hwc.transpose(2, 0, 1), gt_hwc.transpose(2, 0, 1),
                    fast=True)
    loss = ((1.0 - lambda_dssim) * rgb_loss
            + lambda_dssim * (1.0 - ssim_val))
    return loss, {"rgb_diff": rgb_loss, "ssim": ssim_val, "loss": loss}

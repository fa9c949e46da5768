"""Depth-regularized training.

Parity with /root/reference/internal/metrics/inverse_depth_metrics.py:8-70:
loss += weight(step) * D(pred_inverse_depth, gt_inverse_depth) with
weight exp-decayed from `init` by `final_factor` over `max_steps`,
D in {l1, l2, l1+ssim}; rendered key "inverse_depth" or
"hard_inverse_depth" (hard alpha blending).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.ssim import ssim
from .metrics import VanillaMetricsConfig, train_loss
from .trainer import Trainer


@dataclasses.dataclass
class DepthMetricsConfig(VanillaMetricsConfig):
    depth_loss_type: str = "l1"          # l1 | l2 | l1+ssim
    depth_loss_ssim_weight: float = 0.2
    depth_weight_init: float = 1.0
    depth_weight_final_factor: float = 0.01
    depth_weight_max_steps: int = 30_000
    depth_output_key: str = "inverse_depth"  # or hard_inverse_depth


class DepthTrainer(Trainer):
    """Pass the scaled gt inverse-depth map [H, W] as `aux_inputs` to
    train_step (None skips the depth term)."""

    def render_losses(self, gstate, camera, img_height, img_width, bg_color,
                      sh_degree, gt_image, mask, tap, abstap, step,
                      aux_inputs=None, isect_capacity=None,
                      op_params=None, image_idx=None):
        m: DepthMetricsConfig = self.metrics_cfg
        out = self.renderer.forward(
            gstate, camera, img_height, img_width, bg_color, sh_degree,
            render_types=frozenset({"rgb", m.depth_output_key}),
            means2d_tap=tap, absgrad_tap=abstap)
        loss, scalars = train_loss(
            out.render, gt_image, mask,
            lambda_dssim=m.lambda_dssim, rgb_diff_loss=m.rgb_diff_loss)

        gt_inv_depth = aux_inputs
        if gt_inv_depth is not None:
            pred = (out.hard_inverse_depth
                    if m.depth_output_key == "hard_inverse_depth"
                    else out.inverse_depth)
            if m.depth_loss_type == "l2":
                d = jnp.mean((pred - gt_inv_depth) ** 2)
            else:
                d = jnp.mean(jnp.abs(pred - gt_inv_depth))
                if m.depth_loss_type == "l1+ssim":
                    s = ssim(pred[None], gt_inv_depth[None])
                    d = ((1 - m.depth_loss_ssim_weight) * d
                         + m.depth_loss_ssim_weight * (1 - s))
            t = jnp.clip(step.astype(jnp.float32)
                         / m.depth_weight_max_steps, 0.0, 1.0)
            w = m.depth_weight_init * (m.depth_weight_final_factor ** t)
            loss = loss + w * d
            scalars = dict(scalars, loss=loss, depth_loss=d)
        return loss, (scalars, out.radii, out.n_dropped)

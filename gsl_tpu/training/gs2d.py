"""2DGS training: surfel renderer + normal-consistency/distortion losses.

Parity with /root/reference/internal/metrics/gs2d_metrics.py:18-60:
loss += lambda_normal * mean(1 - rend_normal . surf_normal) after step 7000
      + lambda_dist * mean(rend_dist) after step 3000.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .metrics import VanillaMetricsConfig, train_loss
from .trainer import Trainer


@dataclasses.dataclass
class GS2DMetricsConfig(VanillaMetricsConfig):
    lambda_normal: float = 0.05
    lambda_dist: float = 0.0
    normal_from_iter: int = 7000
    dist_from_iter: int = 3000


class GS2DTrainer(Trainer):
    """Trainer using a SurfelRenderer + GS2DMetricsConfig."""

    def render_losses(self, gstate, camera, img_height, img_width, bg_color,
                      sh_degree, gt_image, mask, tap, abstap, step,
                      aux_inputs=None, isect_capacity=None,
                      op_params=None, image_idx=None):
        out = self.renderer.forward(
            gstate, camera, img_height, img_width, bg_color, sh_degree,
            means2d_tap=tap)
        loss, scalars = train_loss(
            out.render, gt_image, mask,
            lambda_dssim=self.metrics_cfg.lambda_dssim,
            rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)

        m = self.metrics_cfg
        lam_n = jnp.where(step > m.normal_from_iter, m.lambda_normal, 0.0)
        lam_d = jnp.where(step > m.dist_from_iter, m.lambda_dist, 0.0)
        normal_err = 1.0 - jnp.sum(out.rend_normal * out.surf_normal,
                                   axis=-1)
        normal_loss = lam_n * jnp.mean(normal_err)
        dist_loss = lam_d * jnp.mean(out.rend_dist)
        loss = loss + normal_loss + dist_loss
        scalars = dict(scalars, loss=loss, normal_loss=normal_loss,
                       dist_loss=dist_loss)
        return loss, (scalars, out.radii, out.n_dropped)

"""Appearance embeddings + per-pixel learned visibility maps (Ha-NeRF).

TPU-native redesign of the reference visibility-map appearance renderer +
metric (/root/reference/internal/renderers/
gsplat_appearance_embedding_visibility_map_renderer.py:80-335,
internal/metrics/visibility_map_metrics.py): per image, a multi-level
dense 2D grid over pixel UV plus a transient embedding feeds a small MLP
predicting per-pixel visibility in [0, 1]; the photometric loss runs on
(vis * render, vis * gt) with a (1 - vis)^2 * 0.2 regularizer so the map
only discounts genuinely transient pixels. Builds on AppearanceTrainer
(same fit dispatch); visibility state rides in extra['__vis__'].
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.cameras import Cameras
from ..models.encodings import (DenseGrid2DEncoding, HashGridEncoding,
                                SkipMLP)
from ..models.gaussian import GaussianState
from .appearance_trainer import AppearanceNetState, AppearanceTrainer
from .metrics import train_loss
from .trainer import TrainState


class VisibilityNetwork(nn.Module):
    n_images: int = 1024
    n_transient_embedding_dims: int = 16
    n_levels: int = 4
    base_resolution: int = 16
    per_level_scale: float = 2.0
    n_layers: int = 3
    n_neurons: int = 64
    grid_type: str = "dense"             # "dense" | "hash"
    log2_hashmap_size: int = 19
    max_resolution: int = 2048

    @nn.compact
    def __call__(self, uv: jnp.ndarray, image_idx) -> jnp.ndarray:
        if self.grid_type == "hash":
            # hash grids don't replicate per image (the table would be
            # n_images x 2^19 rows); instead the image index becomes a
            # third input coordinate, the instant-ngp trick for per-frame
            # conditioning (reference tcnn HashGrid path,
            # configs/tcnn_encoding_config.py:37-50)
            idx_n = (image_idx.astype(jnp.float32) + 0.5) / self.n_images
            x3 = jnp.concatenate(
                [uv, jnp.broadcast_to(idx_n, uv.shape[:-1])[..., None]],
                axis=-1)
            enc = HashGridEncoding(
                n_input_dims=3, n_levels=self.n_levels,
                base_resolution=self.base_resolution,
                log2_hashmap_size=self.log2_hashmap_size,
                max_resolution=self.max_resolution)(x3)
        else:
            enc = DenseGrid2DEncoding(
                n_levels=self.n_levels,
                base_resolution=self.base_resolution,
                per_level_scale=self.per_level_scale,
                n_instances=self.n_images)(uv, image_idx)
        emb = nn.Embed(self.n_images,
                       self.n_transient_embedding_dims)(image_idx)
        emb = jnp.broadcast_to(emb[None, :],
                               enc.shape[:-1] + (emb.shape[-1],))
        x = jnp.concatenate([enc, emb], axis=-1)
        return SkipMLP(n_output_dims=1, n_layers=self.n_layers,
                       n_neurons=self.n_neurons)(x)[..., 0]


@flax.struct.dataclass
class VisibilityNetState:
    params: Any
    opt_state: Any


class VisibilityMapAppearanceTrainer(AppearanceTrainer):
    """AppearanceTrainer + learned per-pixel visibility gating."""

    def __init__(self, *args, vis_reg_factor: float = 0.2,
                 vis_lr: float = 1e-3, n_images: int = 1024,
                 grid_type: str = "dense", **kwargs):
        super().__init__(*args, **kwargs)
        self.vis_reg_factor = vis_reg_factor
        self.vis_net = VisibilityNetwork(n_images=n_images,
                                         grid_type=grid_type)
        self.vis_tx = optax.adam(vis_lr)

    def setup(self, gaussians, cameras_extent, prune_extent=None):
        state = super().setup(gaussians, cameras_extent, prune_extent)
        key = jax.random.PRNGKey(1)
        vis_params = self.vis_net.init(
            key, jnp.zeros((8, 2)), jnp.zeros((), jnp.int32))
        extra = dict(state.extra or {})
        extra["__vis__"] = VisibilityNetState(
            params=vis_params, opt_state=self.vis_tx.init(vis_params))
        return state.replace(extra=extra)

    @functools.partial(jax.jit, static_argnames=(
        "self", "img_height", "img_width", "sh_degree", "warm_up",
        "isect_capacity"))
    def train_step_appearance(self, state: TrainState, camera: Cameras,
                              gt_image: jnp.ndarray, img_height: int,
                              img_width: int, sh_degree: int,
                              bg_color: jnp.ndarray, warm_up: bool,
                              mask: Optional[jnp.ndarray] = None,
                              isect_capacity: Optional[int] = None):
        tap0 = jnp.zeros((state.params.capacity, 2), jnp.float32)
        net_state: AppearanceNetState = state.extra["__net__"]
        vis_state: VisibilityNetState = state.extra["__vis__"]
        gauss_extra = {k: v for k, v in state.extra.items()
                       if k not in ("__net__", "__vis__")} or None
        H, W = img_height, img_width
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        uv = jnp.stack([xs / max(W - 1, 1), ys / max(H - 1, 1)],
                       axis=-1).astype(jnp.float32)      # [H, W, 2]

        def loss_fn(params, net_params, vis_params, tap):
            gstate = GaussianState(params=params, alive=state.alive,
                                   extra=gauss_extra)
            rgbs, op_offset = self._rgbs(gstate, camera, sh_degree,
                                         net_params, warm_up)
            out = self.renderer.forward(
                gstate, camera, H, W, bg_color, sh_degree,
                means2d_tap=tap, rgbs_override=rgbs,
                opacity_offset=op_offset, isect_capacity=isect_capacity)
            vis = self.vis_net.apply(vis_params, uv.reshape(-1, 2),
                                     camera.appearance_id).reshape(H, W)
            vmask = vis if mask is None else vis * mask
            loss, scalars = train_loss(
                out.render * vmask[..., None],
                gt_image * vmask[..., None], None,
                lambda_dssim=self.metrics_cfg.lambda_dssim,
                rgb_diff_loss=self.metrics_cfg.rgb_diff_loss)
            vis_reg = self.vis_reg_factor * jnp.mean((1.0 - vis) ** 2)
            loss = loss + vis_reg
            if op_offset is not None:
                loss = loss + 0.05 * jnp.mean(op_offset)
            scalars = dict(scalars, vis_reg=vis_reg,
                           vis_mean=jnp.mean(vis))
            return loss, (scalars, out.radii, out.n_dropped)

        (loss, (scalars, radii, n_dropped)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                state.params, net_state.params, vis_state.params, tap0)
        pgrads, ngrads, vgrads, tap_grad = grads

        from ..renderers.tile_renderer import viewspace_grad_scale
        from .density import update_stats
        gscale = viewspace_grad_scale(
            W, H, self.renderer_cfg.max_viewspace_grad_scale)
        density = update_stats(state.density, tap_grad, radii, gscale)

        updates, opt_state = self.tx.update(pgrads, state.opt_state,
                                            state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if warm_up:
            new_net = net_state
        else:
            n_updates, n_opt = self.net_tx.update(
                ngrads, net_state.opt_state, net_state.params)
            new_net = AppearanceNetState(
                params=optax.apply_updates(net_state.params, n_updates),
                opt_state=n_opt)
        v_updates, v_opt = self.vis_tx.update(vgrads, vis_state.opt_state,
                                              vis_state.params)
        new_vis = VisibilityNetState(
            params=optax.apply_updates(vis_state.params, v_updates),
            opt_state=v_opt)

        extra = dict(gauss_extra or {})
        extra["__net__"] = new_net
        extra["__vis__"] = new_vis
        new_state = TrainState(
            params=params, alive=state.alive, opt_state=opt_state,
            density=density, step=state.step + 1, extra=extra)
        return new_state, dict(scalars, n_dropped_isects=n_dropped)

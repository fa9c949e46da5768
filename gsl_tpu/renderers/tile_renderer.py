"""Primary renderer: project -> SH colors -> tile binning -> rasterize.

TPU-native equivalent of the reference GSplatV1Renderer pipeline
(/root/reference/internal/renderers/gsplat_v1_renderer.py:135-348):
- anti-aliased mode (default): cov2d low-pass 0.3 + opacity compensation,
- depth / inverse-depth / hard-inverse-depth / alpha channels packed into the
  same rasterize pass as extra composited channels,
- a `means2d_tap` zero-input whose gradient is exactly dL/d(means2d) — the
  functional replacement for `viewspace_points.retain_grad()` used by the
  density controller (gsplat_v1_renderer.py:214 viewspace grad scale),
- template-method seams `get_scales/get_opacities/get_rgbs` kept as override
  points for variant renderers (mip-splatting, appearance embeddings, ...).

Render-type selection is a static frozenset so each combination jits once.
"""
from __future__ import annotations

import dataclasses
from typing import Any, FrozenSet, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Cameras
from ..models.gaussian import GaussianState
from ..ops.projection import project_gaussians, Projections
from ..ops.rasterize_jax import rasterize_tiles
from ..ops.rasterize_pallas import isect_encode_padded, rasterize_pallas
from ..ops.sh import sh_to_rgb
from ..ops.tiling import isect_encode
from .renderer import RendererOutputInfo, RendererOutputType


class RenderOutputs(NamedTuple):
    """All arrays HWC / HW. Only requested keys are non-None."""

    render: jnp.ndarray                    # [H, W, 3]
    alpha: Optional[jnp.ndarray]           # [H, W]
    acc_depth: Optional[jnp.ndarray]       # [H, W] alpha-blended z
    exp_depth: Optional[jnp.ndarray]       # [H, W] acc_depth / alpha
    inverse_depth: Optional[jnp.ndarray]   # [H, W] blended 1/z
    hard_inverse_depth: Optional[jnp.ndarray]  # [H, W]
    normal: Optional[jnp.ndarray]          # [H, W, 3] blended world normals
    projections: Projections
    radii: jnp.ndarray                     # [CAP] int32 (visibility filter)
    n_isects: jnp.ndarray
    n_dropped: jnp.ndarray


@dataclasses.dataclass
class TileRendererConfig:
    tile_size: int = 16
    anti_aliased: bool = True
    filter_2d_kernel_size: float = 0.3
    isect_capacity_factor: int = 4     # capacity = factor * CAP (min floor)
    min_isect_capacity: int = 1 << 16
    max_per_tile: int = 2048
    chunk: int = 128
    max_viewspace_grad_scale: float = 65535.0
    backend: str = "auto"              # "auto" | "pallas" | "xla"
    pallas_chunk: int = 128
    tile_based_culling: bool = True    # StopThePop peak-alpha tile culling:
                                       # drops only slots whose peak alpha is
                                       # below the 1/255 per-pixel threshold,
                                       # i.e. lossless w.r.t. the compositor
    fast_math: bool = True             # bf16-packed sort payloads + default
                                       # matmul precision in the fwd kernel
                                       # (set False for oracle-exact parity)
    stp_resort: bool = False           # StopThePop per-tile depth keys:
                                       # within-tile order by the depth
                                       # plane at the tile center
    exact_sort: bool = False           # secondary full-f32-depth sort key:
                                       # exact lexicographic (tile, depth)
                                       # order (one extra sort operand; the
                                       # packed 19-bit depth prefix is the
                                       # default)

    def instantiate(self) -> "TileRenderer":
        return TileRenderer(self)


class TileRenderer:
    def __init__(self, config: TileRendererConfig):
        self.config = config

    def uses_pallas(self) -> bool:
        """True when forward() will take the Pallas path (which is the only
        backend producing the absgrad tap gradient)."""
        return self.config.backend == "pallas" or (
            self.config.backend == "auto"
            and jax.default_backend() == "tpu")

    # ---- template-method seams (variant renderers override) ----
    def get_means(self, gaussians: GaussianState, camera: Cameras):
        return gaussians.get_means()

    def get_scales(self, gaussians: GaussianState, camera: Cameras):
        return gaussians.get_scales()

    def get_opacities(self, gaussians: GaussianState, camera: Cameras,
                      proj: Projections):
        op = gaussians.get_opacities()
        if self.config.anti_aliased:
            op = op * proj.compensations
        return op

    def get_rgbs(self, gaussians: GaussianState, camera: Cameras,
                 sh_degree: int):
        viewdirs = jax.lax.stop_gradient(
            gaussians.get_means()) - camera.camera_center
        rgbs = sh_to_rgb(gaussians.get_shs(), viewdirs, sh_degree)
        return jnp.clip(rgbs + 0.5, 0.0, None)

    # ---- main forward ----
    def forward(
        self,
        gaussians: GaussianState,
        camera: Cameras,
        img_height: int,
        img_width: int,
        bg_color: jnp.ndarray,            # [3]
        sh_degree: int,
        render_types: FrozenSet[str] = frozenset({"rgb"}),
        scaling_modifier: float = 1.0,
        means2d_tap: Optional[jnp.ndarray] = None,
        absgrad_tap: Optional[jnp.ndarray] = None,
        isect_capacity: Optional[int] = None,
        rgbs_override: Optional[jnp.ndarray] = None,
        opacity_offset: Optional[jnp.ndarray] = None,
    ) -> RenderOutputs:
        cfg = self.config
        cap = gaussians.capacity
        if isect_capacity is None:
            isect_capacity = max(cfg.isect_capacity_factor * cap,
                                 cfg.min_isect_capacity)
        use_pallas = cfg.backend == "pallas" or (
            cfg.backend == "auto" and jax.default_backend() == "tpu")

        with jax.named_scope("gs_project"):
            scales = self.get_scales(gaussians, camera) * scaling_modifier
            proj = project_gaussians(
                self.get_means(gaussians, camera), scales,
                gaussians.get_rotations(),
                camera.world_to_camera, camera.fx, camera.fy, camera.cx,
                camera.cy, img_width, img_height,
                filter_2d=cfg.filter_2d_kernel_size)
        if means2d_tap is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_tap)

        if opacity_offset is not None:
            # appearance opacity head: clamp(op + offset, max=1)
            # (gsplat_appearance_embedding_renderer.py:288-293)
            op = jnp.minimum(
                gaussians.get_opacities()
                + opacity_offset * gaussians.alive, 1.0)
            opacities = op * proj.compensations if cfg.anti_aliased else op
        else:
            opacities = self.get_opacities(gaussians, camera, proj)
        rgbs = (rgbs_override if rgbs_override is not None
                else self.get_rgbs(gaussians, camera, sh_degree))

        # pack extra composited channels next to rgb
        channels = [rgbs]
        bg = [bg_color]
        idx = {}
        c = 3
        need_acc = ({"alpha", "acc_depth", "exp_depth"} & render_types)
        if need_acc:
            channels.append(proj.depths[:, None])
            bg.append(jnp.zeros(1, rgbs.dtype))
            idx["acc_depth"] = c
            c += 1
        if "inverse_depth" in render_types:
            channels.append(1.0 / jnp.maximum(proj.depths[:, None], 1e-8))
            bg.append(jnp.zeros(1, rgbs.dtype))
            idx["inverse_depth"] = c
            c += 1
        if "normal" in render_types:
            # per-gaussian normal = local z axis (third rotation column),
            # flipped to face the camera (reference
            # gsplat_v1_renderer.py:251-261)
            from ..ops.transforms import normalize_quat, quat_to_rotmat
            Rg = quat_to_rotmat(normalize_quat(gaussians.get_rotations()))
            normals = Rg[:, :, 2]
            dirs = jax.lax.stop_gradient(
                self.get_means(gaussians, camera)) - camera.camera_center
            away = jnp.sum(normals * dirs, axis=-1) > 0.0
            normals = normals * jnp.where(away, -1.0, 1.0)[:, None]
            channels.append(normals)
            bg.append(jnp.zeros(3, rgbs.dtype))
            idx["normal"] = c
            c += 3

        ch = jnp.concatenate(channels, axis=-1)
        bgv = jnp.concatenate(bg, axis=-1)

        if absgrad_tap is None:
            absgrad_tap = jnp.zeros_like(proj.means2d)

        if use_pallas:
            # capacity rounding must match the rasterizer's (multiple of the
            # stream block) so n_dropped stays consistent
            from ..ops.rasterize_pallas import _resolve_capacity
            isect_capacity = _resolve_capacity(0, isect_capacity)
            with jax.named_scope("gs_isect"):
                isects_p = isect_encode_padded(
                    proj, img_height, img_width, cfg.tile_size,
                    isect_capacity, cfg.pallas_chunk)
            with jax.named_scope("gs_rasterize"):
                img_nobg, alpha = rasterize_pallas(
                    proj.means2d, proj.conics, opacities, ch, absgrad_tap,
                    isects_p, img_height, img_width, cfg.tile_size,
                    cfg.pallas_chunk, False, isect_capacity,
                    cfg.tile_based_culling, cfg.fast_math, cfg.stp_resort,
                    cfg.exact_sort)
            img = img_nobg + (1.0 - alpha)[..., None] * bgv[None, None, :]
            n_isects, n_dropped = isects_p.n_isects, isects_p.n_dropped
        else:
            isects = isect_encode(
                proj, img_height, img_width, cfg.tile_size, isect_capacity)
            img, alpha = rasterize_tiles(
                proj.means2d, proj.conics, opacities, ch, isects,
                img_height, img_width, tile_size=cfg.tile_size,
                max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
                background=bgv)
            n_isects, n_dropped = isects.n_isects, isects.n_dropped

        hard_inv = None
        if "hard_inverse_depth" in render_types:
            # hard blending: opacity -> op + (1 - op) stop-grad
            # (gsplat_v1_renderer.py:315-345)
            hard_op = opacities + jax.lax.stop_gradient(1.0 - opacities)
            hard_op = hard_op * (opacities > 0.0)
            inv_d = 1.0 / jnp.maximum(proj.depths[:, None], 1e-8)
            if use_pallas:
                hd_img, hd_alpha = rasterize_pallas(
                    proj.means2d, proj.conics, hard_op, inv_d,
                    jnp.zeros_like(proj.means2d), isects_p, img_height,
                    img_width, cfg.tile_size, cfg.pallas_chunk, False,
                    isect_capacity, cfg.tile_based_culling, cfg.fast_math,
                    cfg.stp_resort, None, cfg.exact_sort)
            else:
                hd_img, _ = rasterize_tiles(
                    proj.means2d, proj.conics, hard_op, inv_d, isects,
                    img_height, img_width, tile_size=cfg.tile_size,
                    max_per_tile=cfg.max_per_tile, chunk=cfg.chunk,
                    background=jnp.zeros(1, rgbs.dtype))
            hard_inv = hd_img[..., 0]

        acc_depth = img[..., idx["acc_depth"]] if "acc_depth" in idx else None
        exp_depth = None
        if acc_depth is not None and "exp_depth" in render_types:
            exp_depth = acc_depth / jnp.maximum(alpha, 1e-8)
        inverse_depth = (img[..., idx["inverse_depth"]]
                         if "inverse_depth" in idx else None)

        return RenderOutputs(
            render=img[..., :3],
            alpha=alpha if "alpha" in render_types else None,
            acc_depth=acc_depth,
            exp_depth=exp_depth,
            inverse_depth=inverse_depth,
            hard_inverse_depth=hard_inv,
            normal=(img[..., idx["normal"]:idx["normal"] + 3]
                    if "normal" in idx else None),
            projections=proj,
            radii=proj.radii,
            n_isects=n_isects,
            n_dropped=n_dropped,
        )

    def get_available_outputs(self):
        return {
            "rgb": RendererOutputInfo("render", RendererOutputType.RGB),
            "alpha": RendererOutputInfo("alpha", RendererOutputType.GRAY),
            "acc_depth": RendererOutputInfo("acc_depth",
                                            RendererOutputType.GRAY),
            "exp_depth": RendererOutputInfo("exp_depth",
                                            RendererOutputType.GRAY),
            "inverse_depth": RendererOutputInfo("inverse_depth",
                                                RendererOutputType.GRAY),
            "hard_inverse_depth": RendererOutputInfo(
                "hard_inverse_depth", RendererOutputType.GRAY),
            "normal": RendererOutputInfo("normal",
                                         RendererOutputType.NORMAL_MAP),
        }


def viewspace_grad_scale(img_width: int, img_height: int,
                         max_scale: float = 65535.0) -> jnp.ndarray:
    """0.5*[W, H] clamped — the factor converting normalized means2d grads to
    the densification statistic (gsplat_v1_renderer.py:214)."""
    return jnp.minimum(
        jnp.array([0.5 * img_width, 0.5 * img_height], jnp.float32),
        max_scale)

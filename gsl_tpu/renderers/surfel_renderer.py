"""2DGS surfel renderer.

Parity with /root/reference/internal/renderers/vanilla_2dgs_renderer.py:17-186:
outputs render / rend_alpha / rend_normal (world) / view_normal / rend_dist /
surf_depth (expected-median blend by depth_ratio) / surf_normal
(finite-difference normals of the unprojected depth map, scaled by alpha).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..data.cameras import Cameras
from ..models.gaussian import GaussianState
from ..ops.projection import Projections
from ..ops.sh import sh_to_rgb
from ..ops.surfel import project_surfels, rasterize_surfels
from ..ops.tiling import isect_encode
from .renderer import RendererOutputInfo, RendererOutputType


class SurfelRenderOutputs(NamedTuple):
    render: jnp.ndarray          # [H, W, 3]
    alpha: jnp.ndarray           # [H, W]
    rend_normal: jnp.ndarray     # [H, W, 3] world space (unnormalized)
    view_normal: jnp.ndarray     # [H, W, 3]
    rend_dist: jnp.ndarray       # [H, W]
    surf_depth: jnp.ndarray      # [H, W]
    surf_normal: jnp.ndarray     # [H, W, 3]
    radii: jnp.ndarray           # [CAP]
    n_dropped: jnp.ndarray


@dataclasses.dataclass
class SurfelRendererConfig:
    depth_ratio: float = 0.0     # 0: expected depth; 1: median depth
    tile_size: int = 16
    isect_capacity_factor: int = 4
    min_isect_capacity: int = 1 << 16
    max_per_tile: int = 1024
    chunk: int = 64
    max_viewspace_grad_scale: float = 65535.0
    backend: str = "auto"        # "auto" | "pallas" | "xla": auto takes the
                                 # Pallas kernel path on TPU (interpret mode
                                 # is test-only; XLA is the CPU default)
    pallas_chunk: int = 128

    def instantiate(self) -> "SurfelRenderer":
        return SurfelRenderer(self)


def depth_to_points(camera: Cameras, depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depth map [H, W] to world points [H, W, 3]."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (H, W))
    py = jnp.broadcast_to(ys[:, None], (H, W))
    dir_cam = jnp.stack([(px - camera.cx) / camera.fx,
                         (py - camera.cy) / camera.fy,
                         jnp.ones_like(px)], axis=-1)
    R = camera.R  # w2c
    dir_world = jnp.einsum("ji,hwj->hwi", R, dir_cam)
    origin = camera.camera_center
    return depth[..., None] * dir_world + origin


def depth_to_normal(camera: Cameras, depth: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference world normals of the depth map
    (vanilla_2dgs_renderer.py:168-180)."""
    pts = depth_to_points(camera, depth)
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # safe normalize: jnp.linalg.norm's VJP is 0/0 = NaN at n == 0 (flat
    # or empty regions where dx = dy = 0), and the NaN survives the zero
    # cotangent routed around a maximum() — it then poisons the whole
    # rasterizer backward through the gradient reduce (round-5 gs2d NaN,
    # NOTES_ROUND5). rsqrt(max(n.n, eps)) has a finite VJP everywhere.
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    out = jnp.zeros_like(pts)
    return out.at[1:-1, 1:-1].set(n)


class SurfelRenderer:
    def __init__(self, config: SurfelRendererConfig):
        self.config = config

    def forward(self, gaussians: GaussianState, camera: Cameras,
                img_height: int, img_width: int, bg_color: jnp.ndarray,
                sh_degree: int,
                means2d_tap: Optional[jnp.ndarray] = None,
                **kwargs) -> SurfelRenderOutputs:
        cfg = self.config
        cap = gaussians.capacity
        isect_capacity = max(cfg.isect_capacity_factor * cap,
                             cfg.min_isect_capacity)

        proj = project_surfels(
            gaussians.get_means(), gaussians.get_scales(),
            gaussians.get_rotations(), camera.world_to_camera,
            camera.fx, camera.fy, camera.cx, camera.cy,
            img_width, img_height)
        if means2d_tap is not None:
            # shift the homogeneous center by tap pixels: Tw.xy += tap*Tw.z,
            # so dL/d(tap) is exactly the viewspace (pixel) center gradient
            shift = jnp.concatenate(
                [means2d_tap * proj.Tw[:, 2:3],
                 jnp.zeros_like(proj.Tw[:, :1])], axis=-1)
            proj = proj._replace(Tw=proj.Tw + shift,
                                 means2d=proj.means2d + means2d_tap)

        opacities = gaussians.get_opacities()
        viewdirs = jax.lax.stop_gradient(
            gaussians.get_means()) - camera.camera_center
        rgbs = jnp.clip(
            sh_to_rgb(gaussians.get_shs(), viewdirs, sh_degree) + 0.5,
            0.0, None)
        channels = jnp.concatenate([rgbs, proj.normals], axis=-1)

        # reuse the tile binner through a Projections shim. tile_rect derives
        # the ellipse AABB from the conic, so a radius-r surfel must present
        # an isotropic conic with 3*sqrt(Sigma_xx) = r, i.e. conic = 9/r^2
        # (zero conics would collapse every rect to the center tile)
        r2 = jnp.maximum(proj.radii.astype(jnp.float32), 1.0) ** 2
        iso = 9.0 / r2
        shim = Projections(
            means2d=proj.means2d, depths=proj.depths, radii=proj.radii,
            conics=jnp.stack([iso, jnp.zeros_like(iso), iso], axis=-1),
            compensations=jnp.ones((cap,), jnp.float32), mask=proj.mask)
        use_pallas = cfg.backend == "pallas" or (
            cfg.backend == "auto" and jax.default_backend() == "tpu")
        if use_pallas:
            from ..ops.rasterize_pallas import isect_encode_padded
            from ..ops.surfel import SurfelRenderResult
            from ..ops.surfel_pallas import rasterize_surfels_pallas
            cap_i = -(-isect_capacity // 1024) * 1024
            isects_p = isect_encode_padded(
                shim, img_height, img_width, cfg.tile_size, cap_i)
            interpret = jax.default_backend() != "tpu"
            img, alpha_p, expd, med, dist = rasterize_surfels_pallas(
                proj.Tu, proj.Tv, proj.Tw, proj.zcoef, opacities,
                channels, isects_p, img_height, img_width, cfg.tile_size,
                cfg.pallas_chunk, interpret, cap_i)
            res = SurfelRenderResult(channels=img, alpha=alpha_p,
                                     exp_depth=expd, median_depth=med,
                                     distortion=dist)
            n_dropped = isects_p.n_dropped
        else:
            isects = isect_encode(shim, img_height, img_width,
                                  cfg.tile_size, isect_capacity)
            res = rasterize_surfels(
                proj, opacities, channels, isects, img_height, img_width,
                tile_size=cfg.tile_size, max_per_tile=cfg.max_per_tile,
                chunk=cfg.chunk)
            n_dropped = isects.n_dropped

        render = (res.channels[..., :3]
                  + (1.0 - res.alpha)[..., None] * bg_color[None, None, :])
        view_normal = res.channels[..., 3:6]
        # view -> world: n_world = R_wc^T n_view
        rend_normal = jnp.einsum("ji,hwj->hwi", camera.R, view_normal)

        exp_depth = res.exp_depth / jnp.maximum(res.alpha, 1e-8)
        surf_depth = (exp_depth * (1.0 - cfg.depth_ratio)
                      + cfg.depth_ratio * res.median_depth)
        surf_normal = depth_to_normal(camera, surf_depth)
        surf_normal = surf_normal * jax.lax.stop_gradient(
            res.alpha)[..., None]

        return SurfelRenderOutputs(
            render=render,
            alpha=res.alpha,
            rend_normal=rend_normal,
            view_normal=-view_normal,
            rend_dist=res.distortion,
            surf_depth=surf_depth,
            surf_normal=surf_normal,
            radii=proj.radii,
            n_dropped=n_dropped,
        )

    def get_available_outputs(self):
        return {
            "rgb": RendererOutputInfo("render", RendererOutputType.RGB),
            "rend_alpha": RendererOutputInfo("alpha",
                                             RendererOutputType.GRAY),
            "rend_normal": RendererOutputInfo(
                "rend_normal", RendererOutputType.NORMAL_MAP),
            "view_normal": RendererOutputInfo(
                "view_normal", RendererOutputType.NORMAL_MAP),
            "rend_dist": RendererOutputInfo("rend_dist",
                                            RendererOutputType.GRAY),
            "surf_depth": RendererOutputInfo("surf_depth",
                                             RendererOutputType.GRAY),
            "surf_normal": RendererOutputInfo(
                "surf_normal", RendererOutputType.NORMAL_MAP),
        }

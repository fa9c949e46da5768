"""Gaussian scene model as an immutable, fixed-capacity pytree.

TPU-native redesign of the reference `GaussianModel`/`VanillaGaussian`
(/root/reference/internal/models/gaussian.py:10-116,
 /root/reference/internal/models/vanilla_gaussian.py:22-455):

- instead of an `nn.ParameterDict` whose tensors are reallocated by
  optimizer surgery during densification, parameters live in capacity-padded
  arrays with an `alive` mask; densification is a jitted scatter into free
  slots, and shapes stay static for XLA,
- `GaussianParams` is exactly the differentiable/optimized pytree;
  `GaussianState` wraps it with the (non-trainable) alive mask,
- activations are pure functions (exp / sigmoid / quat-normalize), with the
  same inverse-activation init conventions as the reference,
- per-property optimizer config mirrors the reference LRs exactly
  (vanilla_gaussian.py:22-51: means 1.6e-4*extent exp-decayed, shs_dc 2.5e-3,
  shs_rest /20, opacities 5e-2, scales 5e-3, rotations 1e-3, Adam eps 1e-15).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import num_sh_bases, rgb_to_sh0
from ..ops.transforms import normalize_quat
from ..ops.knn import mean_sq_dist_to_knn


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@flax.struct.dataclass
class GaussianParams:
    """Trainable per-Gaussian properties (raw parameterization, identical to
    the reference: scales = log(s), opacities = logit(o), rotations = wxyz).
    This struct IS the pytree passed to jax.grad and optax."""

    means: jnp.ndarray       # [CAP, 3]
    scales: jnp.ndarray      # [CAP, 3] log-space ([CAP, 2] for surfels)
    rotations: jnp.ndarray   # [CAP, 4] wxyz, unnormalized
    opacities: jnp.ndarray   # [CAP, 1] logit-space
    shs_dc: jnp.ndarray      # [CAP, 1, 3]
    shs_rest: jnp.ndarray    # [CAP, K-1, 3]
    # optional extra trainable per-Gaussian properties (None when unused):
    # 64-d appearance features (appearance_feature_gaussian.py:19-85) and
    # PVG dynamic-scene properties (periodic_vibration_gaussian model)
    appearance_features: Any = None
    t_centers: Any = None     # [CAP, 1] life peak tau
    t_scales: Any = None      # [CAP, 1] log lifespan beta
    velocities: Any = None    # [CAP, 3]

    @property
    def capacity(self) -> int:
        return self.means.shape[0]


@flax.struct.dataclass
class GaussianState:
    """Params + liveness mask (capacity-padded).

    `extra` holds non-trainable per-Gaussian properties (e.g. Mip-Splatting's
    filter_3d — the analogue of the reference's non-optimizable extra
    properties, mip_splatting.py:18-40). Dict of [CAP, ...] arrays or None.
    """

    params: GaussianParams
    alive: jnp.ndarray       # [CAP] bool
    extra: Any = None

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    # ---- activated getters (match reference activation contracts) ----
    def get_means(self):
        return self.params.means

    def get_scales(self):
        return jnp.exp(self.params.scales)

    def get_rotations(self):
        return normalize_quat(self.params.rotations)

    def get_opacities(self):
        """[CAP] activated opacity; dead slots forced to 0 so they never
        rasterize."""
        return jax.nn.sigmoid(self.params.opacities[:, 0]) * self.alive

    def get_shs(self):
        return jnp.concatenate([self.params.shs_dc, self.params.shs_rest],
                               axis=1)


@dataclasses.dataclass
class OptimizationConfig:
    """Reference vanilla_gaussian.py:22-53 LR schedule constants."""

    means_lr_init: float = 1.6e-4
    means_lr_final_factor: float = 0.01   # final = init * factor
    means_lr_max_steps: int = 30_000
    spatial_lr_scale: float = -1.0        # <0: use camera extent
    shs_dc_lr: float = 2.5e-3
    shs_rest_lr_div: float = 20.0
    opacities_lr: float = 5e-2
    scales_lr: float = 5e-3
    rotations_lr: float = 1e-3
    eps: float = 1e-15


@dataclasses.dataclass
class VanillaGaussianConfig:
    sh_degree: int = 3
    optimization: OptimizationConfig = dataclasses.field(
        default_factory=OptimizationConfig)

    def instantiate(self):
        return self  # config doubles as the (stateless) model definition

    # ---- init (reference vanilla_gaussian.py:102-140 semantics) ----
    def init_from_pcd(self, xyz: np.ndarray, rgb: np.ndarray,
                      capacity: int) -> GaussianState:
        """xyz [N,3] float, rgb [N,3] in [0,1]. Pads to `capacity` slots."""
        n = xyz.shape[0]
        if capacity < n:
            raise ValueError(f"capacity {capacity} < point count {n}")
        k = num_sh_bases(self.sh_degree)

        xyz_j = jnp.asarray(xyz, jnp.float32)
        d2 = mean_sq_dist_to_knn(xyz_j, k=3)
        scales = jnp.log(jnp.sqrt(jnp.maximum(d2, 1e-7)))[:, None]
        scales = jnp.tile(scales, (1, 3))

        def padded(x, fill=0.0):
            pad_shape = (capacity - n,) + x.shape[1:]
            return jnp.concatenate(
                [x, jnp.full(pad_shape, fill, x.dtype)], axis=0)

        rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        opac = jnp.full((n, 1), inverse_sigmoid(0.1), jnp.float32)
        sh0 = rgb_to_sh0(jnp.asarray(rgb, jnp.float32))[:, None, :]
        sh_rest = jnp.zeros((n, k - 1, 3), jnp.float32)

        alive = np.zeros((capacity,), np.bool_)
        alive[:n] = True
        params = GaussianParams(
            means=padded(xyz_j),
            scales=padded(scales, fill=-10.0),
            rotations=padded(rot).at[n:, 0].set(1.0),
            opacities=padded(opac, fill=-10.0),
            shs_dc=padded(sh0),
            shs_rest=padded(sh_rest),
        )
        return GaussianState(params=params, alive=jnp.asarray(alive))

    def init_random(self, key: jax.Array, n: int, capacity: int,
                    extent: float = 1.3) -> GaussianState:
        """Blender-style random init: n uniform points in [-e, e]^3, gray
        color (reference blender_dataparser.py:132-143)."""
        k1, _ = jax.random.split(key)
        xyz = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
        rgb = np.full((n, 3), 127.0 / 255.0, np.float32)
        return self.init_from_pcd(np.asarray(xyz), rgb, capacity)


def active_sh_degree(step: int | jnp.ndarray, max_degree: int,
                     interval: int = 1000):
    """SH-degree warmup: +1 every `interval` steps up to max
    (reference vanilla_gaussian.py:314-320)."""
    return jnp.minimum(step // interval, max_degree)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity growth (triggers one recompile of jitted fns)."""
    cap = state.capacity
    extra = new_capacity - cap
    if extra <= 0:
        return state

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0)

    params = jax.tree.map(pad, state.params)
    params = params.replace(
        rotations=params.rotations.at[cap:, 0].set(1.0),
        opacities=params.opacities.at[cap:].set(-10.0),
        scales=params.scales.at[cap:].set(-10.0),
    )
    alive = jnp.concatenate(
        [state.alive, jnp.zeros((extra,), bool)], axis=0)
    # non-trainable per-gaussian extras (e.g. mip filter_3d) pad along rows;
    # non-per-gaussian auxiliaries pass through untouched
    extras = state.extra
    if extras is not None:
        extras = jax.tree.map(
            lambda a: (pad(a) if getattr(a, "ndim", 0) >= 1
                       and a.shape[0] == cap else a), extras)
    return GaussianState(params=params, alive=alive, extra=extras)

"""Generic training plugins: composable extension seams.

Parity with the reference plugin system
(/root/reference/internal/plugins/plugin.py:5-15 + background_removal.py,
freeze_bilagrid.py): a plugin is a config (`instantiate()`) whose runtime
object hooks into the trainer. Two seams map the reference's hook lists
onto the functional design:

- `extra_loss(out, gt_image, mask, gstate, step)` runs INSIDE the jitted
  train step (the reference's `extra_train_metrics` hooks) and returns
  (loss_term, scalars). `required_render_types` extends the renderer's
  output set so the term's inputs exist.
- `after_step(state, step)` runs host-side between steps (the reference's
  `on_train_batch_end_hooks`).
"""
from __future__ import annotations

import dataclasses
from typing import FrozenSet, Tuple

import jax
import jax.numpy as jnp


class Plugin:
    required_render_types: FrozenSet[str] = frozenset()

    def on_setup(self, state):
        """Host-side state mutation at trainer.setup time (the reference's
        `setup(stage='fit')` mixin seam, e.g. normal_reg.py:22-26)."""
        return state

    def extra_loss(self, out, gt_image, mask, gstate, step, camera=None):
        return 0.0, {}

    def after_step(self, state, step):
        return state


@dataclasses.dataclass
class BackgroundRemovalPluginConfig:
    """Pushes masked-out (background) pixels to zero depth so sky/backdrop
    gaussians collapse (reference plugins/background_removal.py): after
    `background_removal_from`, adds
    weight * mean(hard_inverse_depth * (1 - mask))."""
    background_removal_from: int = 7_000
    background_removal_weight: float = 0.1

    def instantiate(self) -> "BackgroundRemovalPlugin":
        return BackgroundRemovalPlugin(self)


class BackgroundRemovalPlugin(Plugin):
    required_render_types = frozenset({"hard_inverse_depth"})

    def __init__(self, config: BackgroundRemovalPluginConfig):
        self.config = config

    def extra_loss(self, out, gt_image, mask, gstate, step, camera=None):
        if mask is None:
            return 0.0, {}
        bkg = 1.0 - mask
        term = jnp.mean(out.hard_inverse_depth * bkg) \
            * self.config.background_removal_weight
        term = jnp.where(step >= self.config.background_removal_from,
                         term, 0.0)
        return term, {"bkg_removal": term}


@dataclasses.dataclass
class FreezeBilagridPluginConfig:
    """Stops bilateral-grid optimization after `freeze_from` (reference
    plugins/freeze_bilagrid.py) by zeroing the grid's update — host-side,
    the processor optimizer state is left untouched."""
    freeze_from: int = 15_000

    def instantiate(self) -> "FreezeBilagridPlugin":
        return FreezeBilagridPlugin(self)


class FreezeBilagridPlugin(Plugin):
    def __init__(self, config: FreezeBilagridPluginConfig):
        self.config = config
        self._frozen_params = None

    def after_step(self, state, step):
        if step < self.config.freeze_from:
            return state
        extra = state.extra if isinstance(state.extra, dict) else None
        if not extra or "__outproc__" not in extra:
            return state
        if self._frozen_params is None:
            self._frozen_params = extra["__outproc__"]
        return state.replace(extra=dict(extra,
                                        __outproc__=self._frozen_params))


@dataclasses.dataclass
class NormalRegPluginConfig:
    """3DGS normal regularization on the MAIN renderer (reference
    internal/metrics/normal_reg.py): the rendered per-gaussian normal map
    must agree with normals finite-differenced from the expected depth, and
    the smallest scale axis is pushed flat. Setup randomizes rotations and
    shrinks the last scale axis /5 (normal_reg.py:22-26) so the flat axis
    is free to orient."""
    normal_reg_lambda: float = 0.05
    flatten_reg: float = 0.02

    def instantiate(self) -> "NormalRegPlugin":
        return NormalRegPlugin(self)


class NormalRegPlugin(Plugin):
    required_render_types = frozenset({"normal", "exp_depth", "alpha"})

    def __init__(self, config: NormalRegPluginConfig):
        self.config = config

    def on_setup(self, state):
        key = jax.random.PRNGKey(7)
        rots = jax.random.uniform(key, state.params.rotations.shape)
        scales = state.params.scales.at[..., -1].add(-jnp.log(5.0))
        return state.replace(
            params=state.params.replace(rotations=rots, scales=scales))

    def extra_loss(self, out, gt_image, mask, gstate, step, camera=None):
        from ..ops.transforms import depth_to_normal
        n_from_depth = depth_to_normal(
            jax.lax.stop_gradient(out.exp_depth), camera.world_to_camera,
            camera.fx, camera.fy, camera.cx, camera.cy)
        n_from_depth = n_from_depth * jax.lax.stop_gradient(
            out.alpha)[..., None]
        normal_err = jnp.mean(
            1.0 - jnp.sum(out.normal * n_from_depth, axis=-1))
        normal_loss = normal_err * self.config.normal_reg_lambda
        flatten = jnp.sum(
            jnp.exp(gstate.params.scales[..., -1]) * gstate.alive
        ) / jnp.maximum(jnp.sum(gstate.alive.astype(jnp.float32)), 1.0)
        flatten_loss = flatten * self.config.flatten_reg
        return normal_loss + flatten_loss, {"normal_loss": normal_loss,
                                            "flatten_loss": flatten_loss}


@dataclasses.dataclass
class GroundRegPluginConfig:
    """Pulls gaussians that sink below a known ground plane back up
    (reference internal/metrics/ground_reg_metrics.py): every
    `ground_reg_interval` steps, penalize mean below-plane altitude; at
    setup, below-ground points are projected to the plane and flattened."""
    up_direction: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    ground_alt: float = 0.0
    ground_reg_lambda: float = 1.0
    ground_reg_interval: int = 10

    def instantiate(self) -> "GroundRegPlugin":
        return GroundRegPlugin(self)


class GroundRegPlugin(Plugin):
    def __init__(self, config: GroundRegPluginConfig):
        import numpy as np
        self.config = config
        up = np.asarray(config.up_direction, np.float32)
        self.up = up / np.linalg.norm(up)

    def _alt(self, params):
        z = params.means @ jnp.asarray(self.up)
        return jnp.asarray(self.config.ground_alt, jnp.float32) - z

    def on_setup(self, state):
        # project below-ground points to the plane; kill their opacity and
        # shrink them (ground_reg_metrics.py:49-56); -15 in logit space is
        # sigmoid ~3e-7 (the reference uses exactly 0, i.e. -inf — finite
        # here so gradients stay NaN-free)
        alt = self._alt(state.params)
        below = alt > 0.0
        means = state.params.means + jnp.where(
            below, alt, 0.0)[:, None] * jnp.asarray(self.up)
        ops = jnp.where(below[:, None], -15.0, state.params.opacities)
        scales = jnp.where(below[:, None], jnp.log(1e-4),
                           state.params.scales)
        return state.replace(params=state.params.replace(
            means=means, opacities=ops, scales=scales))

    def extra_loss(self, out, gt_image, mask, gstate, step, camera=None):
        alt = self._alt(gstate.params)
        below = jax.lax.stop_gradient(
            (alt > 0.0).astype(jnp.float32)) * gstate.alive
        reg = jnp.sum(alt * below) / (jnp.sum(below) + 1.0)
        term = jnp.where(step % self.config.ground_reg_interval == 0,
                         reg * self.config.ground_reg_lambda, 0.0)
        return term, {"ground": term}


PLUGIN_REGISTRY = {
    "background_removal": BackgroundRemovalPluginConfig,
    "freeze_bilagrid": FreezeBilagridPluginConfig,
    "normal_reg": NormalRegPluginConfig,
    "ground_reg": GroundRegPluginConfig,
}

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

import jax.numpy as jnp


class Plugin:
    required_render_types: FrozenSet[str] = frozenset()

    def extra_loss(self, out, gt_image, mask, gstate, step):
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

    def extra_loss(self, out, gt_image, mask, gstate, step):
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


PLUGIN_REGISTRY = {
    "background_removal": BackgroundRemovalPluginConfig,
    "freeze_bilagrid": FreezeBilagridPluginConfig,
}

"""LR schedules as optax-compatible callables.

Math parity with the reference NeRFStudio-style exponential decay
(/root/reference/internal/schedulers.py:35-87): log-space lerp from lr_init
to lr_final over max_steps, with optional warmup ramp and lr_pre_warmup.
"""
from __future__ import annotations

import jax.numpy as jnp


def exponential_decay(lr_init: float, lr_final: float, max_steps: int,
                      warmup_steps: int = 0, lr_pre_warmup: float = 1e-8,
                      ramp: str = "cosine"):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            if ramp == "cosine":
                w = jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / warmup_steps, 0.0, 1.0))
            else:
                w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            pre = lr_pre_warmup + (lr_init - lr_pre_warmup) * w
        else:
            pre = jnp.full_like(step, lr_init)
        t = jnp.clip((step - warmup_steps) /
                     jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0)
        decayed = jnp.exp(
            (1.0 - t) * jnp.log(lr_init) + t * jnp.log(lr_final))
        return jnp.where(step < warmup_steps, pre, decayed)

    return schedule

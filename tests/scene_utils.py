"""Shared synthetic-scene helpers for tests."""
import numpy as np

import jax.numpy as jnp

from gsl_tpu.data.cameras import make_camera


def random_scene(n, seed=0, spread=1.0, z_range=(2.0, 6.0)):
    rng = np.random.RandomState(seed)
    means = np.concatenate([
        rng.uniform(-spread, spread, size=(n, 2)),
        rng.uniform(*z_range, size=(n, 1)),
    ], axis=-1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opacities), jnp.asarray(colors))


def simple_camera(width=64, height=48, f=70.0):
    return make_camera(
        R=np.eye(3, dtype=np.float32),
        T=np.zeros(3, dtype=np.float32),
        fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
        width=width, height=height,
    )

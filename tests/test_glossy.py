"""Glossy env-light tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.glossy import (EnvLightConfig, gaussian_normals,
                                   glossy_rgbs, init_envmap, sample_envmap)


def test_envmap_constant_and_directional():
    env = init_envmap(EnvLightConfig(init_value=0.25))
    dirs = jnp.asarray(np.random.RandomState(0).normal(
        size=(10, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sample_envmap(env, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)

    # top half bright: up-facing dirs sample brighter
    env2 = env.at[:16].set(1.0)
    up = sample_envmap(env2, jnp.array([[0.0, 1.0, 0.0]]))
    down = sample_envmap(env2, jnp.array([[0.0, -1.0, 0.0]]))
    assert float(up[0, 0]) > float(down[0, 0])


def test_gaussian_normals_smallest_axis():
    # flat disk in xy: smallest scale on z -> normal = +-z
    scales = jnp.log(jnp.array([[0.5, 0.5, 0.01]]))
    q = jnp.array([[1.0, 0, 0, 0]])
    n = np.asarray(gaussian_normals(scales, q))[0]
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)


def test_glossy_rgbs_gradients():
    rng = np.random.RandomState(1)
    means = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    scales = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
    base = jnp.full((20, 3), 0.3)
    metal = jnp.full((20,), 0.5)
    env = init_envmap(EnvLightConfig())

    def loss(envmap, m):
        rgb = glossy_rgbs(base, m, envmap, means, scales, quats,
                          jnp.zeros(3))
        return jnp.sum((rgb - 0.8) ** 2)

    g_env, g_m = jax.grad(loss, argnums=(0, 1))(env, metal)
    assert np.isfinite(np.asarray(g_env)).all()
    assert float(jnp.abs(g_env).sum()) > 0
    assert float(jnp.abs(g_m).sum()) > 0

"""Deformable model + selective adam tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.deform import (DeformModelConfig, DeformNetwork,
                                   ast_noise, deform_gaussians)
from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.training.optimizers import selective_adam_update


def _state(n=30, cap=64):
    rng = np.random.RandomState(0)
    return VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32), capacity=cap)


def test_deform_zero_init_is_identity():
    state = _state()
    cfg = DeformModelConfig(n_neurons=32, n_layers=3, skip_layers=(1,))
    net = DeformNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                      jnp.zeros(()))
    m, r, s = deform_gaussians(net, params, state, jnp.asarray(0.5))
    # zero-initialized output heads -> exact identity at init
    np.testing.assert_allclose(np.asarray(m), np.asarray(state.params.means))
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(state.params.rotations))


def test_deform_time_dependence_after_training_signal():
    state = _state()
    cfg = DeformModelConfig(n_neurons=32, n_layers=3, skip_layers=(1,))
    net = DeformNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                      jnp.zeros(()))

    # one gradient step toward moving points at t=1 produces t-dependence
    def loss(p):
        m, _, _ = deform_gaussians(net, p, state, jnp.asarray(1.0))
        return jnp.sum((m - (state.params.means + 0.1)) ** 2)

    g = jax.grad(loss)(params)
    params = jax.tree.map(lambda a, b: a - 1e-2 * b, params, g)
    m0, _, _ = deform_gaussians(net, params, state, jnp.asarray(0.0))
    m1, _, _ = deform_gaussians(net, params, state, jnp.asarray(1.0))
    assert float(jnp.abs(m1 - m0).max()) > 0


def test_ast_noise_anneals():
    k = jax.random.PRNGKey(0)
    t0 = ast_noise(k, 0.5, step=0, max_steps=100)
    t_end = ast_noise(k, 0.5, step=100, max_steps=100)
    assert abs(float(t_end) - 0.5) < 1e-7
    assert abs(float(t0) - 0.5) > 1e-4


def test_selective_adam_update():
    state = _state()
    updates = jax.tree.map(jnp.ones_like, state.params)
    visible = jnp.zeros((64,), bool).at[:10].set(True)
    masked = selective_adam_update(updates, visible)
    assert float(masked.means[:10].sum()) == 30.0
    assert float(masked.means[10:].sum()) == 0.0

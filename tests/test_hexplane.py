"""HexPlane 4D deformation field tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.hexplane import HexPlaneDeformation, HexPlaneField


def test_hexplane_shapes_and_time_dependence():
    field = HexPlaneField(resolutions=(8, 16), n_features=4)
    xyz = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (20, 3)).astype(np.float32))
    params = field.init(jax.random.PRNGKey(0), xyz, jnp.asarray(0.0))
    f0 = field.apply(params, xyz, jnp.asarray(0.0))
    f1 = field.apply(params, xyz, jnp.asarray(1.0))
    assert f0.shape == (20, 8)
    # time planes init to ones (4DGS convention): static at init...
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-6)
    # ...and time-dependent once a time plane varies along its time axis
    def perturb(x):
        if x.ndim == 3 and x.shape[0] == 16:  # time-resolution axis
            ramp = jnp.arange(x.shape[0], dtype=x.dtype) / x.shape[0]
            return x + ramp[:, None, None]
        return x

    perturbed = jax.tree.map(perturb, params)
    g0 = field.apply(perturbed, xyz, jnp.asarray(0.0))
    g1 = field.apply(perturbed, xyz, jnp.asarray(1.0))
    assert float(jnp.abs(g1 - g0).max()) > 0


def test_hexplane_deformation_zero_init_heads():
    net = HexPlaneDeformation(resolutions=(8,), n_features=4, n_neurons=16)
    xyz = jnp.zeros((5, 3))
    params = net.init(jax.random.PRNGKey(0), xyz, jnp.asarray(0.3))
    d_xyz, d_rot, d_scale = net.apply(params, xyz, jnp.asarray(0.3))
    np.testing.assert_allclose(np.asarray(d_xyz), 0.0)
    np.testing.assert_allclose(np.asarray(d_rot), 0.0)

    # trains: one step toward a displacement target changes output
    def loss(p):
        dx, _, _ = net.apply(p, xyz, jnp.asarray(0.3))
        return jnp.sum((dx - 0.05) ** 2)

    g = jax.grad(loss)(params)
    p2 = jax.tree.map(lambda a, b: a - 0.1 * b, params, g)
    dx2, _, _ = net.apply(p2, xyz, jnp.asarray(0.3))
    assert float(jnp.abs(dx2).max()) > 0

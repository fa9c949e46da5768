"""Visibility-map appearance trainer + dense-grid encoding."""
import numpy as np
import jax
import jax.numpy as jnp


def test_dense_grid_encoding():
    from gsl_tpu.models.encodings import DenseGrid2DEncoding
    enc = DenseGrid2DEncoding(n_levels=3, base_resolution=4,
                              n_features=2, n_instances=2)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((5, 2)), 0)
    out = enc.apply(params, jnp.asarray([[0.0, 0.0], [1.0, 1.0],
                                         [0.5, 0.5]]), 1)
    assert out.shape == (3, 6)
    # corner queries hit exact grid cells; instances differ
    o0 = enc.apply(params, jnp.asarray([[0.25, 0.75]]), 0)
    o1 = enc.apply(params, jnp.asarray([[0.25, 0.75]]), 1)
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_visibility_map_trainer_step():
    import sys
    sys.path.insert(0, "tests")
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.models.appearance import AppearanceFeatureGaussianConfig
    from gsl_tpu.renderers.tile_renderer import TileRendererConfig
    from gsl_tpu.training.density import VanillaDensityControllerConfig
    from gsl_tpu.training.trainer import TrainerConfig
    from gsl_tpu.training.visibility_map_trainer import (
        VisibilityMapAppearanceTrainer)

    rng = np.random.RandomState(0)
    model = AppearanceFeatureGaussianConfig(sh_degree=0)
    gaussians = model.init_from_pcd(
        rng.rand(120, 3).astype(np.float32) * 2 - 1,
        rng.rand(120, 3).astype(np.float32), 256)
    trainer = VisibilityMapAppearanceTrainer(
        model=model,
        renderer=TileRendererConfig(min_isect_capacity=4096,
                                    max_per_tile=256, chunk=32),
        density=VanillaDensityControllerConfig(),
        config=TrainerConfig(), n_appearances=8, n_images=8)
    state = trainer.setup(gaussians, 1.0, 1.0)
    assert "__vis__" in state.extra

    H = W = 32
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=40.,
                      fy=40., cx=16., cy=16., width=W, height=H)
    gt = jnp.full((H, W, 3), 0.5, jnp.float32)
    vis_before = jax.tree.leaves(state.extra["__vis__"].params)[0]
    s2, scalars = trainer.train_step_appearance(
        state, cam, gt, H, W, 0, jnp.zeros(3, jnp.float32), warm_up=False)
    assert "vis_reg" in scalars and np.isfinite(float(scalars["vis_reg"]))
    assert 0.0 <= float(scalars["vis_mean"]) <= 1.0
    vis_after = jax.tree.leaves(s2.extra["__vis__"].params)[0]
    assert not np.allclose(np.asarray(vis_after), np.asarray(vis_before))

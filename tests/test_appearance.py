"""Appearance-embedding model + trainer tests."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.appearance import (AppearanceFeatureGaussianConfig,
                                       AppearanceNetwork,
                                       network_lr_schedule,
                                       positional_encoding)
from gsl_tpu.renderers.tile_renderer import TileRendererConfig
from gsl_tpu.training.appearance_trainer import AppearanceTrainer

from scene_utils import simple_camera

W, H = 64, 48


def test_positional_encoding_shape():
    x = jnp.ones((10, 3))
    out = positional_encoding(x, 4)
    assert out.shape == (10, 24)


def test_network_lr_schedule():
    sched = network_lr_schedule(1e-3, 0.1, 30000, 4000)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(4000)) - 1e-3) < 1e-9
    assert abs(float(sched(34000)) - 1e-4) < 1e-9


def test_appearance_network_forward():
    net = AppearanceNetwork(n_appearances=5, is_view_dependent=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((7, 64)),
                      jnp.zeros((), jnp.int32), jnp.zeros((7, 3)))
    out = net.apply(params, jnp.ones((7, 64)), jnp.asarray(2),
                    jnp.ones((7, 3)))
    assert out.shape == (7, 3)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def _setup_trainer():
    rng = np.random.RandomState(5)
    xyz = np.concatenate([rng.uniform(-0.6, 0.6, (80, 2)),
                          rng.uniform(2.5, 5, (80, 1))],
                         axis=1).astype(np.float32)
    rgb = rng.uniform(0, 1, (80, 3)).astype(np.float32)
    model = AppearanceFeatureGaussianConfig(sh_degree=0)
    state0 = model.init_from_pcd(xyz, rgb, capacity=128)
    assert state0.params.appearance_features.shape == (128, 64)
    trainer = AppearanceTrainer(
        model=model,
        renderer=TileRendererConfig(max_per_tile=128, chunk=32,
                                    min_isect_capacity=4096),
        n_appearances=4)
    state = trainer.setup(state0, cameras_extent=1.0)
    return trainer, state


def test_appearance_trainer_warmup_and_train():
    trainer, state = _setup_trainer()
    cam = simple_camera(W, H)
    gt = jnp.full((H, W, 3), 0.3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    # warm-up step: network params must not change
    net0 = state.extra["__net__"].params
    s1, scalars = trainer.train_step_appearance(
        state, cam, gt, H, W, 0, bg, warm_up=True)
    assert np.isfinite(float(scalars["loss"]))
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     net0, s1.extra["__net__"].params)
    assert max(jax.tree.leaves(d)) == 0.0

    # post-warm-up: network trains
    s2, scalars2 = trainer.train_step_appearance(
        s1, cam, gt, H, W, 0, bg, warm_up=False)
    d2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      s1.extra["__net__"].params, s2.extra["__net__"].params)
    assert max(jax.tree.leaves(d2)) > 0.0
    # appearance features got gradients too
    assert float(jnp.abs(s2.params.appearance_features).max()) > 0.0


def test_appearance_density_clone_copies_features():
    """Densification must carry appearance_features to cloned slots."""
    from gsl_tpu.training.density import (VanillaDensityControllerConfig,
                                          densify_and_prune,
                                          init_density_state)
    from gsl_tpu.training.optimizers import build_gaussian_optimizer
    from gsl_tpu.models.gaussian import GaussianState, OptimizationConfig

    trainer, state = _setup_trainer()
    p = state.params.replace(
        appearance_features=state.params.appearance_features.at[0].set(7.0),
        scales=state.params.scales.at[0].set(jnp.log(0.001)))
    gstate = GaussianState(params=p, alive=state.alive)
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0,
                                  has_appearance_features=True)
    opt_state = tx.init(p)
    dstate = init_density_state(128).replace(
        grad_accum=jnp.zeros(128).at[0].set(1.0),
        denom=jnp.ones(128))
    new_state, *_ = densify_and_prune(
        jax.random.PRNGKey(0), gstate, opt_state, dstate,
        VanillaDensityControllerConfig(), 1.0, 100.0,
        use_size_prune=jnp.asarray(False))
    feats = np.asarray(new_state.params.appearance_features)
    alive = np.asarray(new_state.alive)
    clones = [i for i in range(80, 128) if alive[i] and feats[i, 0] == 7.0]
    assert len(clones) == 1


def test_similarity_regularization_step():
    """kNN feature-similarity reg pulls neighboring features together
    (reference appearance_feature_similarity_regularization_metrics.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gsl_tpu.models.appearance import AppearanceFeatureGaussianConfig
    from gsl_tpu.training.optimizers import build_gaussian_optimizer
    from gsl_tpu.models.gaussian import OptimizationConfig
    from gsl_tpu.training.similarity_reg import (SimilarityRegConfig,
                                                 similarity_loss,
                                                 make_similarity_reg_step)

    rng = np.random.RandomState(0)
    model = AppearanceFeatureGaussianConfig(sh_degree=0)
    xyz = rng.rand(100, 3).astype(np.float32) * 0.1   # tight cluster
    gs = model.init_from_pcd(xyz, rng.rand(100, 3).astype(np.float32), 128)
    # random features -> dissimilar neighbors -> positive loss magnitude
    feats = jnp.asarray(rng.randn(128, gs.params.appearance_features
                                  .shape[-1]), jnp.float32)
    gs = gs.replace(params=gs.params.replace(appearance_features=feats))
    cfg = SimilarityRegConfig(n_appearance_samples=32, n_appearance_nn=4,
                              distance_weight_decay=1.0)
    l_rand = similarity_loss(cfg, gs.params.means, feats, gs.alive,
                             jax.random.PRNGKey(0))
    # identical features -> cosine similarity 1 -> strictly lower loss
    ones = jnp.ones_like(feats)
    l_same = similarity_loss(cfg, gs.params.means, ones, gs.alive,
                             jax.random.PRNGKey(0))
    assert float(l_same) < float(l_rand)

    from gsl_tpu.training.trainer import TrainState
    from gsl_tpu.training.density import init_density_state
    tx = build_gaussian_optimizer(OptimizationConfig(), 1.0,
                                  has_appearance_features=True)
    state = TrainState(params=gs.params, alive=gs.alive,
                       opt_state=tx.init(gs.params),
                       density=init_density_state(128),
                       step=jnp.asarray(0))
    step = make_similarity_reg_step(cfg, tx)
    s2, loss = step(state, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(s2.params.appearance_features),
                           np.asarray(feats))

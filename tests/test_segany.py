"""SegAny feature distillation: synthetic two-object scene — features must
become discriminative between the two SAM masks."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.models.gaussian import GaussianState, VanillaGaussianConfig, \
    inverse_sigmoid
from gsl_tpu.training.segany import (SegAnyConfig, SegAnyTrainer,
                                     correspondence_loss, render_features,
                                     scale_gate)

from scene_utils import simple_camera

W, H = 64, 48


def _two_cluster_scene():
    rng = np.random.RandomState(0)
    left = np.concatenate([rng.normal(-0.6, 0.1, (60, 1)),
                           rng.normal(0, 0.15, (60, 1)),
                           rng.normal(4, 0.1, (60, 1))], axis=1)
    right = np.concatenate([rng.normal(0.6, 0.1, (60, 1)),
                            rng.normal(0, 0.15, (60, 1)),
                            rng.normal(4, 0.1, (60, 1))], axis=1)
    xyz = np.concatenate([left, right]).astype(np.float32)
    rgb = np.full((120, 3), 0.5, np.float32)
    cfg = VanillaGaussianConfig(sh_degree=0)
    state = cfg.init_from_pcd(xyz, rgb, capacity=128)
    params = state.params.replace(
        opacities=state.params.opacities.at[:120, 0].set(
            inverse_sigmoid(0.9)))
    return GaussianState(params=params, alive=state.alive)


def test_scale_gate_monotone():
    f = jnp.ones((4, 32))
    low = scale_gate(f, jnp.asarray(0.1))
    high = scale_gate(f, jnp.asarray(1.0))
    assert float(low.sum()) < float(high.sum())


def test_feature_distillation_separates_objects():
    gstate = _two_cluster_scene()
    cam = simple_camera(W, H, f=60.0)

    # SAM masks: left half / right half of the image
    m_left = np.zeros((H, W), bool)
    m_left[:, : W // 2] = True
    masks = jnp.asarray(np.stack([m_left, ~m_left]))
    mask_scales = jnp.asarray([1000.0, 1000.0])

    trainer = SegAnyTrainer(SegAnyConfig(feature_dims=16,
                                         n_sampled_pixels=256,
                                         scale_aware=False),
                            gstate)
    key = jax.random.PRNGKey(0)
    features, tx, opt_state = trainer.init(key)
    step = trainer.make_train_step(tx, H, W, max_per_tile=128, chunk=32,
                                   isect_capacity=8192)

    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        features, opt_state, loss = step(features, opt_state, k, cam,
                                         masks, mask_scales, None)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # rendered features of the two clusters should be dissimilar
    fmap, alpha = render_features(gstate, features, cam, H, W,
                                  max_per_tile=128, chunk=32,
                                  isect_capacity=8192)
    f = np.asarray(fmap)
    fl = f[:, : W // 2].reshape(-1, 16).mean(0)
    fr = f[:, W // 2:].reshape(-1, 16).mean(0)
    cos = float(np.dot(fl, fr)
                / (np.linalg.norm(fl) * np.linalg.norm(fr) + 1e-9))
    assert cos < 0.9, cos

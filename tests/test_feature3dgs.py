"""Feature3DGS distillation (reference feature_3dgs_renderer.py:31-467)."""
import numpy as np
import jax
import jax.numpy as jnp

from gsl_tpu.training.feature3dgs import (Feature3DGSConfig,
                                          Feature3DGSTrainer,
                                          selection_score, query_edit_mask)


def _scene(n=150, cap=256):
    from gsl_tpu.models.gaussian import VanillaGaussianConfig
    rng = np.random.RandomState(0)
    model = VanillaGaussianConfig(sh_degree=0)
    xyz = rng.rand(n, 3).astype(np.float32) * 2 - 1
    return model.init_from_pcd(xyz, rng.rand(n, 3).astype(np.float32), cap)


def test_feature_distillation_converges():
    from gsl_tpu.data.cameras import make_camera
    scene = _scene()
    cfg = Feature3DGSConfig(n_feature_dims=8, isect_capacity=4096,
                            feature_lr=0.05)
    trainer = Feature3DGSTrainer(cfg, scene)
    params, tx, opt = trainer.init(jax.random.PRNGKey(0))
    H = W = 32
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=40., fy=40.,
                      cx=16., cy=16., width=W, height=H)
    gt = jnp.full((16, 16, 8), 0.25, jnp.float32)
    step = trainer.make_train_step(H, W)
    losses = []
    for _ in range(40):
        params, opt, loss = step(params, opt, cam, gt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[::10]


def test_speedup_decoder():
    from gsl_tpu.data.cameras import make_camera
    scene = _scene()
    cfg = Feature3DGSConfig(n_feature_dims=8, speedup=True,
                            isect_capacity=4096)
    assert cfg.actual_dims == 4
    trainer = Feature3DGSTrainer(cfg, scene)
    params, tx, opt = trainer.init(jax.random.PRNGKey(0))
    assert params["features"].shape[-1] == 4
    assert params["dec_w"].shape == (4, 8)
    H = W = 32
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fx=40., fy=40.,
                      cx=16., cy=16., width=W, height=H)
    gt = jnp.asarray(np.random.RandomState(1).rand(16, 16, 8), jnp.float32)
    step = trainer.make_train_step(H, W)
    # features start at zero so dec_w's gradient is zero on step 1;
    # the bias must move immediately and dec_w once features are nonzero
    b_before = np.asarray(params["dec_b"]).copy()
    params, opt, loss = step(params, opt, cam, gt)
    assert not np.allclose(np.asarray(params["dec_b"]), b_before)
    w_before = np.asarray(params["dec_w"]).copy()
    for _ in range(3):
        params, opt, loss = step(params, opt, cam, gt)
    assert not np.allclose(np.asarray(params["dec_w"]), w_before)


def test_selection_score_modes():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(50, 16), jnp.float32)
    q1 = feats[3:4]                      # single query aligned with row 3
    s = np.asarray(selection_score(feats, q1, score_threshold=0.99))
    assert s[3] == 1.0
    # multi-query argmax-membership mode
    q = jnp.concatenate([feats[3:4], -feats[3:4]], axis=0)
    s2 = np.asarray(selection_score(feats, q, positive_ids=(0,)))
    assert s2[3] == 1.0 and s2.min() == 0.0
    # edit mask plumbing (with decoder)
    params = {"features": feats[:, :8],
              "dec_w": jnp.eye(8, 16), "dec_b": jnp.zeros(16)}
    m = query_edit_mask(params, q1, score_threshold=0.0)
    assert m.shape == (50,)

"""PLY roundtrip + checkpoint save/load."""
import numpy as np
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.utils.ply import (load_gaussian_ply, save_gaussian_ply,
                               save_state_ply)
from gsl_tpu.utils.checkpoint import (find_latest_checkpoint,
                                      load_checkpoint, save_checkpoint)


def _state(n=20, cap=32):
    cfg = VanillaGaussianConfig(sh_degree=3)
    rng = np.random.RandomState(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return cfg.init_from_pcd(xyz, rgb, capacity=cap)


def test_ply_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "model.ply")
    n = save_state_ply(path, state)
    assert n == 20
    loaded = load_gaussian_ply(path)
    assert loaded["means"].shape == (20, 3)
    assert loaded["shs_rest"].shape == (20, 15, 3)
    np.testing.assert_allclose(loaded["means"],
                               np.asarray(state.params.means[:20]),
                               rtol=1e-6)
    np.testing.assert_allclose(loaded["shs_dc"],
                               np.asarray(state.params.shs_dc[:20]),
                               rtol=1e-6)
    np.testing.assert_allclose(loaded["rotations"],
                               np.asarray(state.params.rotations[:20]),
                               rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from gsl_tpu.training.trainer import Trainer
    trainer = Trainer()
    state = trainer.setup(_state(), cameras_extent=1.0)
    p = save_checkpoint(str(tmp_path / "ckpts"), state, step=7)
    assert find_latest_checkpoint(str(tmp_path / "ckpts")) == p
    save_checkpoint(str(tmp_path / "ckpts"), state, step=30)
    latest = find_latest_checkpoint(str(tmp_path / "ckpts"))
    assert latest.endswith("step_30")
    restored = load_checkpoint(latest, state)
    np.testing.assert_allclose(np.asarray(restored.params.means),
                               np.asarray(state.params.means))
    assert int(restored.step) == int(state.step)

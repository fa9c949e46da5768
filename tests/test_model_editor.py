"""Multi-model editor (reference internal/utils/gaussian_model_editor.py)."""
import numpy as np
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.utils.gaussian_model_editor import MultipleGaussianModelEditor


def _model(n, seed, sh_degree=0):
    rng = np.random.RandomState(seed)
    return VanillaGaussianConfig(sh_degree=sh_degree).init_from_pcd(
        rng.rand(n, 3).astype(np.float32),
        rng.rand(n, 3).astype(np.float32), capacity=max(2 * n, 64))


def test_editor_merge_transform_delete(tmp_path):
    a = _model(50, 0, sh_degree=0)
    b = _model(30, 1, sh_degree=2)     # different SH widths unify
    ed = MultipleGaussianModelEditor([a, b])
    assert ed.n_gaussians() == 80

    # transform model 0 far away; merged means reflect it
    ed.transform(0, translate=(100.0, 0.0, 0.0))
    merged = ed.merged()
    m = np.asarray(merged.params.means)[np.asarray(merged.alive)]
    assert (m[:, 0] > 50).sum() == 50

    # delete model 1's gaussians inside its bounding box
    n_del = ed.delete_in_box(1, [-10, -10, -10], [10, 10, 10])
    assert n_del == 30
    assert ed.n_gaussians() == 50

    ed.reset(0)
    assert np.asarray(ed.merged().params.means)[
        np.asarray(ed.merged().alive)][:, 0].max() < 50

    out = str(tmp_path / "merged.ply")
    ed.save_ply(out)
    from gsl_tpu.utils.ply import load_gaussian_ply
    arrays = load_gaussian_ply(out)
    assert arrays["means"].shape[0] == 50
    assert arrays["shs_rest"].shape[1] == 8   # widest model's bands

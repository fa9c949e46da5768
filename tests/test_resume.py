"""Mid-training resume: kill at step k, resume, trajectory matches an
uninterrupted run bit-for-bit (VERDICT round-1 'next' item 4; reference
`--ckpt_path last` semantics, internal/cli.py:92-110)."""
import os

import numpy as np
import jax

from gsl_tpu.cli import build_components
from gsl_tpu.training.fit import fit

from test_fit_e2e import _make_dataset


def _cfg(out_dir, max_steps, resume="auto"):
    return {
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": os.path.dirname(out_dir),
                                          "random_point_count": 300,
                                          "white_background": False}}},
        "model": {
            "gaussian": {"sh_degree": 1},
            "renderer": {"init_args": {"max_per_tile": 256, "chunk": 32,
                                       "min_isect_capacity": 8192}},
            # densify every 4 steps so the rng stream is actually consumed
            # and restored rng state matters for the parity check
            "density": {"init_args": {"densify_from_iter": 1,
                                      "densification_interval": 4,
                                      "opacity_reset_interval": 10000}},
        },
        "trainer": {"max_steps": max_steps},
        "fit": {"max_steps": max_steps, "output_dir": out_dir,
                "min_capacity": 1024, "log_interval": 4,
                "save_iterations": [], "save_ply": False,
                "resume": resume},
    }


def _run(root, out_dir, max_steps, resume="auto"):
    trainer, dataparser_cfg, fit_cfg = build_components(
        _cfg(out_dir, max_steps, resume))
    dataparser_cfg.path = root
    outputs = dataparser_cfg.instantiate().get_outputs()
    state, _ = fit(trainer, outputs, fit_cfg, val_at_end=False)
    return state


def test_resume_matches_uninterrupted(tmp_path):
    _make_dataset(str(tmp_path))

    # uninterrupted 16-step run
    ref = _run(str(tmp_path), str(tmp_path / "ref"), 16, resume="never")

    # killed at 8, resumed to 16
    _run(str(tmp_path), str(tmp_path / "resumed"), 8, resume="never")
    assert os.path.isdir(str(tmp_path / "resumed" / "checkpoints" /
                             "step_8"))
    res = _run(str(tmp_path), str(tmp_path / "resumed"), 16, resume="auto")

    assert int(res.step) == int(ref.step) == 16
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves_with_path(res.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0,
            err_msg=f"params diverged at {pa}")
    # optimizer moments also identical
    for a, b in zip(jax.tree_util.tree_leaves(ref.opt_state),
                    jax.tree_util.tree_leaves(res.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # loss continuity across the save->resume boundary (VERDICT r4 #3:
    # the round-4 quality log showed an impossible loss right after a
    # resume): the logged losses of the resumed run must match the
    # uninterrupted run's AND satisfy the loss formula's invariant
    # (0.8*L1 + 0.2*(1-SSIM) >= 0)
    import csv as _csv

    def logged(out):
        with open(os.path.join(out, "train_log.csv")) as f:
            return {int(r[0]): float(r[1])
                    for r in list(_csv.reader(f))[1:]}

    ref_log = logged(str(tmp_path / "ref"))
    res_log = logged(str(tmp_path / "resumed"))
    assert ref_log and res_log
    for step, loss in res_log.items():
        assert loss >= 0.0, f"impossible negative loss {loss} @ {step}"
        if step in ref_log:
            np.testing.assert_allclose(loss, ref_log[step], rtol=1e-6)


def test_resume_with_raised_min_capacity(tmp_path):
    """A checkpoint saved at a smaller model capacity must be loadable
    after min_capacity is raised (pre-sizing to avoid capacity-growth
    retraces, NOTES_ROUND5): fit loads into a template built at the
    stored capacity, then grows to the configured one."""
    _make_dataset(str(tmp_path))
    _run(str(tmp_path), str(tmp_path / "o"), 8, resume="never")

    trainer, dataparser_cfg, fit_cfg = build_components(
        _cfg(str(tmp_path / "o"), 12, "auto"))
    fit_cfg.min_capacity = 4096          # > the stored capacity (1024)
    fit_cfg.min_isect_capacity = 1 << 15
    dataparser_cfg.path = str(tmp_path)
    outputs = dataparser_cfg.instantiate().get_outputs()
    state, _ = fit(trainer, outputs, fit_cfg, val_at_end=False)
    assert int(state.step) == 12
    assert int(state.params.capacity) >= 4096
    assert np.isfinite(np.asarray(state.params.means)).all()


def test_resume_never_starts_fresh(tmp_path):
    _make_dataset(str(tmp_path))
    _run(str(tmp_path), str(tmp_path / "o"), 4, resume="never")
    st = _run(str(tmp_path), str(tmp_path / "o"), 4, resume="never")
    assert int(st.step) == 4


def test_resume_with_spotless_state(tmp_path):
    """SpotLess resume: the '__spotless__' extra (mask MLP + its Adam
    state + error histogram) is injected BEFORE load_checkpoint so the
    orbax template matches the saved tree (ADVICE r2 medium #1)."""
    import sys
    sys.path.insert(0, "tests")
    from gsl_tpu.cli import build_components, load_config

    _make_dataset(str(tmp_path), n_views=4)
    configs = os.path.join(os.path.dirname(__file__), "..", "gsl_tpu",
                           "configs")
    ov = {
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": str(tmp_path),
                                          "random_point_count": 200,
                                          "white_background": False}}},
        "model": {"gaussian": {"sh_degree": 0},
                  "renderer": {"init_args": {"max_per_tile": 256,
                                             "chunk": 32,
                                             "min_isect_capacity": 8192}}},
        "trainer": {"max_steps": 12,
                    "background_color": [0., 0., 0.]},
        "fit": {"max_steps": 12, "output_dir": str(tmp_path / "out"),
                "min_capacity": 1024, "save_iterations": [8],
                "save_ply": False, "log_interval": 50, "resume": "auto"},
    }
    cfg = load_config([os.path.join(configs, "spotless.yaml")], ov)
    trainer, dp_cfg, fit_cfg = build_components(cfg)
    outputs = dp_cfg.instantiate().get_outputs()
    state1, _ = fit(trainer, outputs, fit_cfg, val_at_end=False)
    assert "__spotless__" in state1.extra
    hist1 = np.asarray(state1.extra["__spotless__"]["hist"]).copy()
    assert hist1.sum() > 0

    # resume from the step-8 checkpoint and continue to 16
    cfg2 = load_config([os.path.join(configs, "spotless.yaml")],
                       dict(ov, fit=dict(ov["fit"], max_steps=16),
                            trainer=dict(ov["trainer"], max_steps=16)))
    trainer2, dp2, fit_cfg2 = build_components(cfg2)
    outputs2 = dp2.instantiate().get_outputs()
    state2, _ = fit(trainer2, outputs2, fit_cfg2, val_at_end=False)
    assert int(state2.step) == 16
    sls = state2.extra["__spotless__"]
    # histogram kept accumulating across the resume (not re-initialized)
    assert float(np.asarray(sls["hist"]).sum()) > 0
    assert np.isfinite(np.asarray(sls["mlp"]["w1"])).all()


def test_resume_with_deform_state(tmp_path):
    """Checkpoint/resume round-trips variant network state in extra
    (deform field params + Adam state)."""
    import sys
    sys.path.insert(0, "tests")
    from test_fit_e2e import _make_dataset
    from gsl_tpu.cli import build_components, load_config
    from gsl_tpu.training.fit import fit

    _make_dataset(str(tmp_path), n_views=4)
    ov = {
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": str(tmp_path),
                                          "random_point_count": 200}}},
        "model": {"gaussian": {"sh_degree": 0},
                  "deform": {"field": "mlp", "init_args": {"warm_up": 2}},
                  "renderer": {"init_args": {"max_per_tile": 256,
                                             "chunk": 32,
                                             "min_isect_capacity": 8192}}},
        "fit": {"max_steps": 8, "output_dir": str(tmp_path / "out"),
                "min_capacity": 1024, "save_iterations": [6],
                "save_ply": False, "log_interval": 5, "resume": "auto"},
        "trainer": {"max_steps": 8},
    }
    cfg = load_config([], ov)
    trainer, dp_cfg, fit_cfg = build_components(cfg)
    outputs = dp_cfg.instantiate().get_outputs()
    state1, _ = fit(trainer, outputs, fit_cfg, val_at_end=False)
    net1 = state1.extra["__deform__"]

    # resume: continue to 12 from the step-6 checkpoint
    cfg2 = load_config([], dict(ov, fit=dict(
        ov["fit"], max_steps=12)))
    trainer2, dp2, fit_cfg2 = build_components(cfg2)
    outputs2 = dp2.instantiate().get_outputs()
    state2, _ = fit(trainer2, outputs2, fit_cfg2, val_at_end=False)
    assert int(state2.step) == 12
    net2 = state2.extra["__deform__"]
    import jax
    l1 = jax.tree.leaves(net1.params)
    l2 = jax.tree.leaves(net2.params)
    assert len(l1) == len(l2)
    assert all(np.isfinite(np.asarray(x)).all() for x in l2)

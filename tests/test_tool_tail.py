"""Tool-tail CLIs (VERDICT round-3 ask #6): merge_ply, gaussian_transform,
convert2splat, eval_scenes."""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def _random_ply(path, n, sh_rest_bands=3, seed=0):
    from gsl_tpu.utils.ply import save_gaussian_ply
    rng = np.random.RandomState(seed)
    arrays = dict(
        means=rng.normal(size=(n, 3)).astype(np.float32),
        scales=rng.uniform(-6, -4, (n, 3)).astype(np.float32),
        rotations=rng.normal(size=(n, 4)).astype(np.float32),
        opacities=rng.normal(size=(n, 1)).astype(np.float32),
        shs_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        shs_rest=rng.normal(size=(n, sh_rest_bands, 3)).astype(np.float32))
    save_gaussian_ply(path, arrays["means"], arrays["scales"],
                      arrays["rotations"], arrays["opacities"],
                      arrays["shs_dc"], arrays["shs_rest"])
    return arrays


def test_merge_ply(tmp_path):
    import merge_ply
    a = _random_ply(str(tmp_path / "a.ply"), 50, sh_rest_bands=3, seed=0)
    b = _random_ply(str(tmp_path / "b.ply"), 30, sh_rest_bands=0, seed=1)
    out = str(tmp_path / "m.ply")
    merge_ply.main([out, str(tmp_path / "a.ply"), str(tmp_path / "b.ply")])

    from gsl_tpu.utils.ply import load_gaussian_ply
    m = load_gaussian_ply(out)
    assert m["means"].shape[0] == 80
    # mixed SH degrees: the lower one zero-padded up
    assert m["shs_rest"].shape[1] == 3
    np.testing.assert_allclose(m["means"][:50], a["means"], rtol=1e-6)
    np.testing.assert_allclose(m["shs_rest"][50:], 0.0)
    np.testing.assert_allclose(m["means"][50:], b["means"], rtol=1e-6)


def test_gaussian_transform_rigid(tmp_path):
    import gaussian_transform
    src = str(tmp_path / "in.ply")
    arrays = _random_ply(src, 40, seed=2)
    out = str(tmp_path / "out.ply")
    gaussian_transform.main([src, out, "--rotate-euler", "0", "0", "90",
                             "--translate", "1", "2", "3",
                             "--scale", "2.0"])
    from gsl_tpu.utils.ply import load_gaussian_ply
    t = load_gaussian_ply(out)
    # means: scale then rotate (z, 90deg: x,y -> -y,x) then translate
    m = arrays["means"] * 2.0
    expect = np.stack([-m[:, 1] + 1, m[:, 0] + 2, m[:, 2] + 3], axis=-1)
    np.testing.assert_allclose(t["means"], expect, rtol=1e-4, atol=1e-5)
    # log-scales shift by log(2)
    np.testing.assert_allclose(t["scales"], arrays["scales"] + np.log(2.0),
                               rtol=1e-5, atol=1e-5)

    # inverse transform round-trips (SH bands included)
    back = str(tmp_path / "back.ply")
    gaussian_transform.main([out, back, "--translate", "-1", "-2", "-3"])
    gaussian_transform.main([back, back, "--rotate-euler", "0", "0", "-90"])
    gaussian_transform.main([back, back, "--scale", "0.5"])
    r = load_gaussian_ply(back)
    np.testing.assert_allclose(r["means"], arrays["means"], rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(r["shs_rest"], arrays["shs_rest"],
                               rtol=1e-3, atol=1e-4)


def test_convert2splat(tmp_path):
    import convert2splat
    src = str(tmp_path / "in.ply")
    arrays = _random_ply(src, 25, seed=3)
    out = str(tmp_path / "out.splat")
    convert2splat.main([src, out])
    data = open(out, "rb").read()
    assert len(data) == 25 * 32
    # first record = highest importance (sigmoid(op) * volume)
    opac = 1 / (1 + np.exp(-arrays["opacities"][:, 0]))
    vol = np.exp(arrays["scales"]).prod(-1)
    top = int(np.argmax(opac * vol))
    pos = np.frombuffer(data[:12], np.float32)
    np.testing.assert_allclose(pos, arrays["means"][top], rtol=1e-6)
    a = data[27]
    assert abs(a - opac[top] * 255) <= 1.0


def test_eval_scenes(tmp_path):
    """Train a tiny run through the CLI, then the eval CLI aggregates its
    MEAN row into the reference-style summary."""
    import eval_scenes
    from test_fit_e2e import _make_dataset
    from gsl_tpu.cli import main as cli_main
    _make_dataset(str(tmp_path), n_views=4)
    cli_main([
        "fit", "--config",
        os.path.join(TOOLS, "..", "gsl_tpu", "configs", "blender.yaml"),
        "--data.path", str(tmp_path), "-n", "scene_a",
        "--output", str(tmp_path / "runs"), "--max_steps", "5",
        "data.parser.init_args.random_point_count=200",
        "model.gaussian.sh_degree=0",
        "model.renderer.init_args.max_per_tile=256",
        "model.renderer.init_args.chunk=32",
        "model.renderer.init_args.min_isect_capacity=8192",
        "fit.min_capacity=1024", "fit.save_iterations=[5]",
        "fit.save_ply=false", "fit.log_interval=5", "fit.resume=never",
    ])
    eval_scenes.main(["--output", str(tmp_path / "runs"),
                      "--scenes", "scene_a", "--split", "val"])
    summary = str(tmp_path / "runs" / "eval_summary.csv")
    assert os.path.isfile(summary)
    rows = open(summary).read().splitlines()
    assert rows[0].startswith("scene,psnr")
    assert rows[1].startswith("scene_a,")
    assert rows[-1].startswith("MEAN,")

"""HTTP viewer end-to-end: serve a trained model, fetch page + render."""
import os
import time
import urllib.request

import numpy as np
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.utils.ply import save_state_ply
from gsl_tpu.viewer import Viewer

from scene_utils import random_scene


def test_http_viewer_serves(tmp_path):
    means, scales, quats, opac, colors = random_scene(80, 2)
    state = VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        np.asarray(means), np.asarray(colors), capacity=128)
    run = tmp_path / "run" / "point_cloud" / "iteration_100"
    save_state_ply(str(run / "point_cloud.ply"), state)

    v = Viewer(str(tmp_path / "run"), port=18999, image_size=48)
    v.start(block=False)
    time.sleep(0.5)
    page = urllib.request.urlopen("http://127.0.0.1:18999/",
                                  timeout=30).read()
    assert b"gsl_tpu viewer" in page
    img = urllib.request.urlopen(
        "http://127.0.0.1:18999/render?yaw=10&pitch=-10&dist=6&output=rgb",
        timeout=120).read()
    assert img[:8] == b"\x89PNG\r\n\x1a\n"


def test_viewer_panels(tmp_path):
    """Transform / edit / camera-path panels on the HTTP viewer
    (reference internal/viewer/ui/*)."""
    means, scales, quats, opac, colors = random_scene(80, 3)
    state = VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        np.asarray(means), np.asarray(colors), capacity=128)
    run = tmp_path / "run" / "point_cloud" / "iteration_100"
    save_state_ply(str(run / "point_cloud.ply"), state)

    v = Viewer(str(tmp_path / "run"), port=18998, image_size=32)
    v.start(block=False)
    time.sleep(0.5)
    base = "http://127.0.0.1:18998"

    # transform: translate far away -> render must change
    img0 = urllib.request.urlopen(
        f"{base}/render?yaw=0&pitch=-10&dist=6", timeout=120).read()
    urllib.request.urlopen(f"{base}/transform?tx=50&ty=0&tz=0&s=1",
                           timeout=30).read()
    img1 = urllib.request.urlopen(
        f"{base}/render?yaw=0&pitch=-10&dist=6", timeout=120).read()
    assert img1 != img0
    urllib.request.urlopen(f"{base}/transform?reset=1", timeout=30)

    # edit: delete everything in a huge box -> fewer alive
    n_before = int(np.asarray(v.renderer.state.alive).sum())
    msg = urllib.request.urlopen(
        f"{base}/edit/delete_box?min=-100,-100,-100&max=100,100,100",
        timeout=30).read()
    assert b"deleted" in msg
    assert int(np.asarray(v.renderer.state.alive).sum()) < n_before

    # camera path -> animated gif
    urllib.request.urlopen(f"{base}/path/add?yaw=0&pitch=-10&dist=6",
                           timeout=30)
    urllib.request.urlopen(f"{base}/path/add?yaw=90&pitch=-10&dist=6",
                           timeout=30)
    gif = urllib.request.urlopen(f"{base}/path/render.gif",
                                 timeout=300).read()
    assert gif[:6] in (b"GIF87a", b"GIF89a")


def test_training_viewer_pump():
    """TrainingViewer: client camera request -> train-loop pump -> frame."""
    import json
    from gsl_tpu.viewer.training_viewer import TrainingViewer

    tv = TrainingViewer(port=18997, image_size=16, pump_interval=1).start()
    time.sleep(0.3)
    base = "http://127.0.0.1:18997"
    st = json.loads(urllib.request.urlopen(
        f"{base}/status?yaw=10&pitch=-10&dist=5", timeout=30).read())
    assert st.get("frame") is None

    def render_fn(yaw, pitch, dist):
        return np.full((16, 16, 3), 128, np.uint8)

    tv.pump(1, render_fn, {"loss": 0.5, "n_gaussians": 100})
    st = json.loads(urllib.request.urlopen(
        f"{base}/status?yaw=10&pitch=-10&dist=5", timeout=30).read())
    assert st["frame"] == 1 and st["loss"] == 0.5
    frame = urllib.request.urlopen(f"{base}/frame", timeout=30).read()
    assert frame[:2] == b"\xff\xd8"  # JPEG
    tv.stop()


def test_camera_path_save_and_render_playback(tmp_path):
    """Camera-path keyframes persist to json and render.py plays them."""
    import json, subprocess, sys, os
    means, scales, quats, opac, colors = random_scene(60, 4)
    state = VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        np.asarray(means), np.asarray(colors), capacity=64)
    run = tmp_path / "run" / "point_cloud" / "iteration_1"
    save_state_ply(str(run / "point_cloud.ply"), state)

    v = Viewer(str(tmp_path / "run"), port=18995, image_size=24)
    v.start(block=False)
    time.sleep(0.4)
    base = "http://127.0.0.1:18995"
    urllib.request.urlopen(f"{base}/path/add?yaw=0&pitch=-10&dist=5",
                           timeout=30)
    urllib.request.urlopen(f"{base}/path/add?yaw=45&pitch=-20&dist=6",
                           timeout=30)
    kf = str(tmp_path / "camera_path.json")
    urllib.request.urlopen(f"{base}/path/save?file={kf}", timeout=30)
    assert len(json.load(open(kf))["keyframes"]) == 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "render.py", str(tmp_path / "run"),
         "--keyframes", kf, "--n_frames", "4", "--size", "24",
         "--output", str(tmp_path / "frames")],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.isfile(str(tmp_path / "frames" / "00003.png"))


def test_viewer_throttle_and_measure(tmp_path):
    """Low/high-resolution throttling (reference client.py states) and the
    distance-measurement endpoint (reference ui/distance_measurement.py)."""
    import urllib.request
    from gsl_tpu.viewer.viewer import Viewer
    means, scales, quats, opac, colors = random_scene(60, 2)
    state = VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        np.asarray(means), np.asarray(colors), capacity=128)
    run = tmp_path / "run" / "point_cloud" / "iteration_10"
    save_state_ply(str(run / "point_cloud.ply"), state)
    v = Viewer(str(tmp_path / "run"), port=18993, image_size=32,
               max_fps=1000.0, moving_window_s=0.2)
    # first frame: idle -> full resolution
    png, res = v.render_frame(0.0, -15.0, 6.0)
    assert res == 32
    # second frame with a new pose inside the moving window -> half
    # resolution (the first render included jit compile, so widen the
    # window rather than racing it)
    v.moving_window_s = 1e9
    v.max_fps = 1e9          # keep the fps cache out of this assertion
    png2, res2 = v.render_frame(5.0, -15.0, 6.0)
    assert res2 == 16
    v.moving_window_s = 0.2
    # same pose again within the fps budget: cached frame served
    v.max_fps = 0.0001
    png3, res3 = v.render_frame(5.0, -15.0, 6.0)
    assert png3 == png2 and res3 == res2

    # measurement: two points unprojected through the depth map
    d, a, b = v.measure(0.0, -15.0, 6.0, (0.3, 0.5), (0.7, 0.5))
    assert np.isfinite(d) and d >= 0.0

    # endpoint smoke over HTTP
    v.max_fps = 1000.0
    srv = v.start(block=False)
    try:
        r = urllib.request.urlopen(
            "http://127.0.0.1:18993/measure?p1=0.3,0.5&p2=0.7,0.5"
            "&yaw=0&pitch=-15&dist=6", timeout=30)
        assert b"distance" in r.read()
    finally:
        srv.shutdown()


def test_ply_third_party_variants(tmp_path):
    """Loader accepts ascii, double-precision, and 2-scale (2DGS) plys
    (reference gaussian_utils.py:52-90 via plyfile)."""
    import io as _io
    from gsl_tpu.utils.ply import load_gaussian_ply, save_gaussian_ply

    n = 5
    rng = np.random.RandomState(0)
    means = rng.randn(n, 3).astype(np.float32)
    scales = rng.randn(n, 3).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    ops = rng.randn(n, 1).astype(np.float32)
    dc = rng.randn(n, 1, 3).astype(np.float32)
    rest = rng.randn(n, 3, 3).astype(np.float32)  # sh degree 1

    base = str(tmp_path / "a.ply")
    save_gaussian_ply(base, means, scales, rots, ops, dc, rest)
    ref = load_gaussian_ply(base)

    # ascii variant
    cols = np.concatenate([
        means, np.zeros((n, 3), np.float32),
        dc.transpose(0, 2, 1).reshape(n, -1),
        rest.transpose(0, 2, 1).reshape(n, -1),
        ops, scales, rots], axis=1)
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(9)]
             + ["opacity"] + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    hdr = ["ply", "format ascii 1.0", f"element vertex {n}"]
    hdr += [f"property float {nm}" for nm in names] + ["end_header"]
    body = "\n".join(" ".join(f"{x:.9g}" for x in row) for row in cols)
    p_ascii = str(tmp_path / "ascii.ply")
    with open(p_ascii, "w") as f:
        f.write("\n".join(hdr) + "\n" + body + "\n")
    got = load_gaussian_ply(p_ascii)
    np.testing.assert_allclose(got["means"], ref["means"], rtol=1e-5)
    np.testing.assert_allclose(got["shs_rest"], ref["shs_rest"], rtol=1e-5)

    # double-precision binary variant
    hdr_d = ["ply", "format binary_little_endian 1.0",
             f"element vertex {n}"]
    hdr_d += [f"property double {nm}" for nm in names] + ["end_header"]
    p_double = str(tmp_path / "double.ply")
    with open(p_double, "wb") as f:
        f.write(("\n".join(hdr_d) + "\n").encode())
        f.write(cols.astype("<f8").tobytes())
    got = load_gaussian_ply(p_double)
    np.testing.assert_allclose(got["means"], ref["means"], rtol=1e-6)

    # 2-scale (2DGS) variant: third scale padded
    names2 = [nm for nm in names if nm != "scale_2"]
    cols2 = cols[:, [i for i, nm in enumerate(names) if nm != "scale_2"]]
    hdr2 = ["ply", "format binary_little_endian 1.0",
            f"element vertex {n}"]
    hdr2 += [f"property float {nm}" for nm in names2] + ["end_header"]
    p_2d = str(tmp_path / "gs2d.ply")
    with open(p_2d, "wb") as f:
        f.write(("\n".join(hdr2) + "\n").encode())
        f.write(cols2.astype("<f4").tobytes())
    got = load_gaussian_ply(p_2d)
    assert got["scales"].shape == (n, 3)
    np.testing.assert_allclose(got["scales"][:, :2], scales[:, :2],
                               rtol=1e-6)
    assert np.allclose(got["scales"][:, 2], np.log(1e-6))

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

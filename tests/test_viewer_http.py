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

"""Offline preprocessing tools (pure-python paths; the model-dependent
extractors are gated on locally installed weights)."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, cwd=REPO,
                          env={**os.environ, "JAX_PLATFORMS": "cpu"})


def test_image_downsample(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "images" / "sub"
    img_dir.mkdir(parents=True)
    Image.new("RGB", (64, 48), (200, 10, 10)).save(str(img_dir / "a.png"))
    Image.new("RGB", (64, 48), (10, 200, 10)).save(
        str(tmp_path / "images" / "b.jpg"))
    r = _run(["tools/image_downsample.py", str(tmp_path), "--factor", "4"])
    assert r.returncode == 0, r.stderr
    with Image.open(str(tmp_path / "images_4" / "sub" / "a.png")) as im:
        assert im.size == (16, 12)
    assert os.path.isfile(str(tmp_path / "images_4" / "b.jpg"))


def test_appearance_groups(tmp_path):
    from PIL import Image
    d = tmp_path / "images"
    (d / "cam0").mkdir(parents=True)
    (d / "cam1").mkdir()
    for c in ("cam0", "cam1"):
        for i in range(2):
            Image.new("RGB", (8, 8)).save(str(d / c / f"{i}.png"))
    r = _run(["tools/generate_image_appearance_groups.py", str(tmp_path),
              "--mode", "dir"])
    assert r.returncode == 0, r.stderr
    groups = json.load(open(str(tmp_path / "appearance_groups.json")))
    assert len(groups) == 4
    assert len(set(groups.values())) == 2


def test_get_depth_scales(tmp_path):
    """Synthetic colmap scene + synthetic inverse-depth maps with a known
    scale/shift -> the solver recovers them."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_dataparsers import _write_synthetic_colmap
    _write_synthetic_colmap(str(tmp_path), n_images=3)

    from gsl_tpu.data.colmap_io import qvec_to_rotmat, read_model
    model = read_model(os.path.join(str(tmp_path), "sparse", "0"))
    dd = tmp_path / "estimated_depths"
    dd.mkdir()
    a_true, b_true = 2.0, 0.1
    for im in model.images.values():
        cam = model.cameras[im.camera_id]
        H, W = int(cam.height), int(cam.width)
        R = qvec_to_rotmat(im.qvec)
        p_cam = model.points_xyz @ R.T + im.tvec
        # build a dense inverse-depth map consistent with the sparse pts
        d = np.zeros((H, W), np.float32)
        z = p_cam[:, 2]
        ok = z > 0.01
        u = np.round(cam.fx * p_cam[ok, 0] / z[ok] + cam.cx).astype(int)
        v = np.round(cam.fy * p_cam[ok, 1] / z[ok] + cam.cy).astype(int)
        inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        d[v[inb], u[inb]] = (1.0 / z[ok][inb] - b_true) / a_true
        stem = im.name[:im.name.rfind(".")]
        np.save(str(dd / f"{stem}.npy"), d)
    r = _run(["tools/get_depth_scales.py", str(tmp_path),
              "--min-points", "3"])
    assert r.returncode == 0, r.stderr
    scales = json.load(open(str(tmp_path / "estimated_depth_scales.json")))
    assert len(scales) >= 1
    for v in scales.values():
        assert abs(v["scale"] - a_true) < 0.2, v
        assert abs(v["offset"] - b_true) < 0.1, v


def test_sfm_outlier_detection(tmp_path):
    """A far-away camera gets flagged; healthy ones don't."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_dataparsers import _write_synthetic_colmap
    _write_synthetic_colmap(str(tmp_path), n_images=8)
    # append an outlier pose to the binary images.bin
    import struct
    ib = str(tmp_path / "sparse" / "0" / "images.bin")
    raw = open(ib, "rb").read()
    (n,) = struct.unpack("<Q", raw[:8])
    rec = struct.pack("<i", 999) + struct.pack("<4d", 1, 0, 0, 0) \
        + struct.pack("<3d", 500, 500, 500) + struct.pack("<i", 1) \
        + b"bad_cam.png\x00" + struct.pack("<Q", 0)
    with open(ib, "wb") as f:
        f.write(struct.pack("<Q", n + 1) + raw[8:] + rec)
    r = _run(["tools/sfm_outlier_detection.py", str(tmp_path)])
    assert r.returncode == 0, r.stderr
    flagged = open(str(tmp_path / "sfm_outliers.txt")).read()
    assert "bad_cam.png" in flagged
    assert flagged.strip().count("\n") == 0  # only the bad one


def test_meganerf2colmap(tmp_path):
    """Mega-NeRF metadata -> COLMAP sparse model round trip
    (reference utils/meganerf2colmap.py pose conventions)."""
    import subprocess, sys
    import torch
    from PIL import Image

    root = tmp_path / "mega"
    rng = np.random.RandomState(0)
    root.mkdir()
    torch.save({"pose_scale_factor": 2.0,
                "origin_drb": torch.tensor([1.0, 2.0, 3.0])},
               str(root / "coordinates.pt"))
    for split, n in (("train", 3), ("val", 1)):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for i in range(n):
            c2w = np.eye(4)[:3]
            c2w = c2w + rng.randn(3, 4) * 0.01
            torch.save({"c2w": torch.tensor(c2w, dtype=torch.float),
                        "intrinsics": torch.tensor([50., 50., 16., 12.]),
                        "W": 32, "H": 24},
                       str(root / split / "metadata" / f"{split}{i}.pt"))
            Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(
                str(root / split / "rgbs" / f"{split}{i}.jpg"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/meganerf2colmap.py", str(root),
         "--seed-points", "500"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-1500:]

    from gsl_tpu.data.colmap_io import read_model
    model = read_model(str(root / "colmap" / "sparse" / "0"))
    assert len(model.images) == 4
    assert len(model.cameras) == 1
    assert model.points_xyz.shape == (500, 3)
    cam = next(iter(model.cameras.values()))
    assert cam.model == "PINHOLE" and cam.width == 32

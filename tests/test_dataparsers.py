"""Dataparser tests against synthesized on-disk datasets."""
import json
import os

import numpy as np
import pytest

from gsl_tpu.data.colmap_io import (ColmapCamera, ColmapImage, ColmapModel,
                                    qvec_to_rotmat, rotmat_to_qvec,
                                    read_model, write_model_bin)
from gsl_tpu.data.dataparsers.colmap import ColmapDataParserConfig
from gsl_tpu.data.dataparsers.blender import BlenderDataParserConfig
from gsl_tpu.data.dataset import CachedDataset, DataLoader


def _rand_quat(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


def test_qvec_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = _rand_quat(rng)
        R = qvec_to_rotmat(q)
        q2 = rotmat_to_qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-6)


def _write_synthetic_colmap(root, n_images=10, n_points=500):
    rng = np.random.RandomState(1)
    cam = ColmapCamera(1, "PINHOLE", 64, 48,
                       np.array([70.0, 70.0, 32.0, 24.0]))
    images = {}
    for i in range(n_images):
        images[i + 1] = ColmapImage(
            i + 1, _rand_quat(rng), rng.normal(size=3) * 0.1, 1,
            f"img_{i:03d}.png")
    model = ColmapModel(
        cameras={1: cam}, images=images,
        points_xyz=rng.uniform(-1, 1, size=(n_points, 3)),
        points_rgb=rng.randint(0, 256, size=(n_points, 3)).astype(np.uint8),
        points_err=rng.uniform(0, 2, size=n_points),
    )
    write_model_bin(model, os.path.join(root, "sparse", "0"))
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    from PIL import Image
    for im in images.values():
        arr = rng.randint(0, 256, size=(48, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", im.name))
    return model


def test_colmap_bin_roundtrip(tmp_path):
    model = _write_synthetic_colmap(str(tmp_path))
    loaded = read_model(str(tmp_path / "sparse" / "0"))
    assert loaded.cameras[1].model == "PINHOLE"
    assert len(loaded.images) == len(model.images)
    np.testing.assert_allclose(loaded.points_xyz, model.points_xyz)
    np.testing.assert_allclose(loaded.images[3].qvec, model.images[3].qvec)
    assert loaded.images[3].name == model.images[3].name


def test_colmap_parser(tmp_path):
    _write_synthetic_colmap(str(tmp_path))
    cfg = ColmapDataParserConfig(path=str(tmp_path), eval_step=4)
    out = cfg.instantiate().get_outputs()
    assert len(out.train_set) == 10                  # reconstruction mode
    assert len(out.val_set) == 3                     # every 4th of 10
    assert out.point_cloud.xyz.shape == (500, 3)
    assert out.camera_extent > 0
    assert out.train_set.cameras.R.shape == (10, 3, 3)
    # error filtering
    cfg2 = ColmapDataParserConfig(path=str(tmp_path), max_point_error=1.0)
    out2 = cfg2.instantiate().get_outputs()
    assert out2.point_cloud.xyz.shape[0] < 500


def test_colmap_parser_experiment_split(tmp_path):
    _write_synthetic_colmap(str(tmp_path))
    cfg = ColmapDataParserConfig(path=str(tmp_path), eval_step=4,
                                 split_mode="experiment")
    out = cfg.instantiate().get_outputs()
    assert len(out.train_set) == 7
    assert len(out.val_set) == 3
    assert set(out.train_set.image_names).isdisjoint(
        set(out.val_set.image_names))


def _write_synthetic_blender(root, n=4, w=32, h=32):
    from PIL import Image
    rng = np.random.RandomState(2)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i in range(n):
        name = f"train/r_{i}"
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3 + i * 0.1]
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
        arr = rng.randint(0, 256, size=(h, w, 4)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, name + ".png"))
    meta = {"camera_angle_x": 0.7, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


def test_blender_parser(tmp_path):
    _write_synthetic_blender(str(tmp_path))
    cfg = BlenderDataParserConfig(path=str(tmp_path),
                                  random_point_count=1000)
    out = cfg.instantiate().get_outputs()
    assert len(out.train_set) == 4
    assert out.point_cloud.xyz.shape == (1000, 3)
    assert np.all(np.abs(out.point_cloud.xyz) <= 1.3)
    fx = float(out.train_set.cameras.fx[0])
    assert fx == pytest.approx(0.5 * 32 / np.tan(0.35), rel=1e-5)


def test_dataloader(tmp_path):
    _write_synthetic_blender(str(tmp_path))
    out = BlenderDataParserConfig(
        path=str(tmp_path), random_point_count=100).instantiate().get_outputs()
    ds = CachedDataset(out.train_set, background=np.ones(3, np.float32))
    loader = DataLoader(ds, seed=0, async_prefetch=False)
    it = iter(loader)
    seen = set()
    for _ in range(8):  # two epochs of 4
        cam, name, img, mask = next(it)
        assert img.shape == (32, 32, 3)
        assert img.dtype == np.float32
        assert mask is None
        seen.add(name)
    assert len(seen) == 4


def test_dataset_masks(tmp_path):
    """Per-image masks load, binarize (nonzero = keep), and nearest-resize
    to the image resolution (reference internal/dataset.py:118-137)."""
    from PIL import Image
    _write_synthetic_blender(str(tmp_path))
    out = BlenderDataParserConfig(
        path=str(tmp_path), random_point_count=100).instantiate().get_outputs()
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    m = np.zeros((16, 16), np.uint8)   # half-resolution on purpose
    m[:, 8:] = 255
    mp = str(mask_dir / "m.png")
    Image.fromarray(m).save(mp)
    out.train_set.mask_paths = [mp] + [None] * (len(out.train_set) - 1)
    ds = CachedDataset(out.train_set, background=np.ones(3, np.float32))
    cam, name, img, mask = ds.get(0)
    assert mask is not None and mask.shape == (32, 32)
    assert mask[:, :16].max() == 0.0 and mask[:, 16:].min() == 1.0
    assert ds.get(1)[3] is None


def test_ngp_parser(tmp_path):
    from gsl_tpu.data.dataparsers.ngp import NGPDataParserConfig
    from PIL import Image
    rng = np.random.RandomState(4)
    os.makedirs(tmp_path / "images", exist_ok=True)
    frames = []
    for i in range(6):
        name = f"images/{i:04d}.png"
        Image.fromarray(rng.randint(0, 255, (32, 40, 3)).astype(
            np.uint8)).save(tmp_path / name)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0, 3]
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    meta = {"fl_x": 35.0, "fl_y": 36.0, "cx": 20.0, "cy": 16.0,
            "w": 40, "h": 32, "frames": frames}
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(meta, f)
    out = NGPDataParserConfig(path=str(tmp_path),
                              random_point_count=500).instantiate(
                              ).get_outputs()
    assert len(out.train_set) == 6
    assert float(out.train_set.cameras.fx[0]) == 35.0
    assert out.point_cloud.xyz.shape == (500, 3)

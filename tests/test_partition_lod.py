"""PartitionLoD serving renderer: level selection by camera distance,
fixed-capacity assembly, SAT frustum visibility, prune-tool LoD build.
(reference internal/renderers/partition_lod_renderer.py:22-787)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gsl_tpu.data.cameras import make_camera
from gsl_tpu.utils.partitioning import (Partition, PartitionedScene,
                                        SceneConfig)
from gsl_tpu.utils.ply import save_gaussian_ply


def _write_partition(run_dir, means, color, n_sh_rest=0, seed=0):
    rng = np.random.RandomState(seed)
    n = means.shape[0]
    out = os.path.join(run_dir, "point_cloud", "iteration_1")
    os.makedirs(out, exist_ok=True)
    save_gaussian_ply(
        os.path.join(out, "point_cloud.ply"),
        means.astype(np.float32),
        np.full((n, 3), -3.0, np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        np.full((n, 1), 2.0, np.float32),
        np.tile(np.asarray(color, np.float32), (n, 1, 1)),
        np.zeros((n, n_sh_rest, 3), np.float32))


def _toy_scene(tmp_path, n_fine=64, n_coarse=16):
    """Two partitions along x (up axis = y): cells [-2,0) and [0,2)."""
    root = str(tmp_path / "parts")
    scene = PartitionedScene(
        config=SceneConfig(origin=np.zeros(2), partition_size=2.0),
        partitions=[
            Partition(ij=np.array([0, 0]), xy_min=np.array([-2.0, -2.0]),
                      xy_max=np.array([0.0, 2.0]),
                      camera_mask=np.ones(4, bool)),
            Partition(ij=np.array([1, 0]), xy_min=np.array([0.0, -2.0]),
                      xy_max=np.array([2.0, 2.0]),
                      camera_mask=np.ones(4, bool)),
        ],
        rotation=np.eye(3))
    scene.save(os.path.join(root, "partitions.npz"))

    rng = np.random.RandomState(0)
    for pi, x0 in enumerate((-1.0, 1.0)):
        for name, n in (("lod0", n_fine), ("lod1", n_coarse)):
            means = rng.rand(n, 3).astype(np.float32) * 0.8
            means[:, 0] += x0 - 0.4
            means[:, 1] *= 0.2
            _write_partition(
                os.path.join(root, name, f"partition_{pi:03d}"),
                means, [[0.5, 0.2, 0.1]] if pi == 0 else [[0.1, 0.2, 0.5]])
    return root


def _lod_renderer(root, **kw):
    from gsl_tpu.renderers.partition_lod import PartitionLoDConfig
    from gsl_tpu.renderers.tile_renderer import TileRendererConfig
    return PartitionLoDConfig(
        data=root, names=("lod0", "lod1"), lod_distances=(1.5,),
        renderer=TileRendererConfig(min_isect_capacity=4096,
                                    max_per_tile=256, chunk=32),
        **kw).instantiate().setup()


def _cam(x, z=6.0):
    return make_camera(R=np.eye(3), T=np.array([-x, 0.0, z]),
                       fx=60.0, fy=60.0, cx=32.0, cy=32.0,
                       width=64, height=64)


def test_level_selection_switches_with_distance(tmp_path):
    root = _toy_scene(tmp_path)
    lod = _lod_renderer(root)
    bg = jnp.zeros(3, jnp.float32)

    # camera above partition 0 (x=-1): p0 close -> lod0; p1 at distance
    # 1.0 < 1.5*2.0 -> also fine. Move far in +x: p0 drops to coarse.
    cam_near0 = _cam(-1.0, z=0.5)
    lods, vis = lod.select(cam_near0)
    assert lods[0] == 0
    assert vis.all()

    cam_far = _cam(8.0, z=0.5)
    lods_far, _ = lod.select(cam_far)
    assert lods_far[0] == 1, "distant partition must pick the coarser LoD"

    out_near, st_near = lod.forward(cam_near0, 64, 64, bg)
    out_far, st_far = lod.forward(cam_far, 64, 64, bg)
    assert st_far["n_gaussians"] < st_near["n_gaussians"]
    assert np.isfinite(np.asarray(out_near.render)).all()


def test_assembly_cache_reuse(tmp_path):
    root = _toy_scene(tmp_path)
    lod = _lod_renderer(root)
    bg = jnp.zeros(3, jnp.float32)
    cam = _cam(-1.0, z=0.5)
    lod.forward(cam, 64, 64, bg)
    state1 = lod._cached_state
    lod.forward(cam, 64, 64, bg)
    assert lod._cached_state is state1, "same selection must not re-pack"
    lod.forward(_cam(8.0, z=0.5), 64, 64, bg)
    assert lod._cached_state is not state1


def test_visibility_filter_culls_behind_camera(tmp_path):
    root = _toy_scene(tmp_path)
    lod = _lod_renderer(root, visibility_filter=True)
    # camera at z=+6 between partitions looking down -z: both in front
    lods, vis = lod.select(_cam(0.0, z=6.0))
    assert vis.all()
    # camera way past the scene still looking down -z: partitions behind
    cam_behind = make_camera(R=np.eye(3), T=np.array([0.0, 0.0, 20.0]),
                             fx=60.0, fy=60.0, cx=32.0, cy=32.0,
                             width=64, height=64)
    # world2cam T=+20 -> scene at z=-20... still in front; flip view by
    # putting the camera at z=-6 (scene now behind the -z-looking camera)
    cam_back = make_camera(R=np.eye(3), T=np.array([0.0, 0.0, -6.0]),
                           fx=60.0, fy=60.0, cx=32.0, cy=32.0,
                           width=64, height=64)
    lods2, vis2 = lod.select(cam_back)
    # the closest partition stays visible by rule; the other must be culled
    assert vis2.sum() == 1


def test_prune_tool_builds_coarser_level(tmp_path):
    root = _toy_scene(tmp_path)
    import subprocess, sys
    r = subprocess.run(
        [sys.executable, os.path.join("tools", "prune_partitions.py"),
         root, "--src", "lod0", "--dst", "lod2", "--percent", "0.5",
         "--mode", "opacity"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    st, _, _ = GaussianModelLoader.load(
        os.path.join(root, "lod2", "partition_000"))
    assert int(np.asarray(st.alive).sum()) == 32  # half of 64

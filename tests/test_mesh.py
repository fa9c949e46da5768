"""TSDF fusion + marching tetrahedra (gsl_tpu/utils/mesh.py), the
open3d-free replacement for the reference 2DGS mesh pipeline
(internal/utils/gs2d_mesh_utils.py)."""
import numpy as np

from gsl_tpu.utils.mesh import (TSDFVolume, marching_tetrahedra,
                                save_mesh_ply)


def test_marching_tetrahedra_sphere():
    """Analytic sphere SDF -> extracted vertices sit on the sphere."""
    R = 48
    g = np.arange(R) - (R - 1) / 2.0
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - 15.0
    verts, faces = marching_tetrahedra(sdf.astype(np.float32))
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts - (R - 1) / 2.0, axis=-1)
    np.testing.assert_allclose(r, 15.0, atol=0.2)
    # every face references valid vertices; surface is edge-manifold-ish:
    # each undirected edge appears exactly twice on a closed surface
    assert faces.min() >= 0 and faces.max() < len(verts)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    ekey = edges.min(1).astype(np.int64) * len(verts) + edges.max(1)
    _, counts = np.unique(ekey, return_counts=True)
    assert (counts == 2).mean() > 0.99, "sphere mesh should be closed"


def test_tsdf_fusion_sphere(tmp_path):
    """Depth maps of a synthetic sphere fuse into a spherical mesh."""
    H = W = 64
    f = 60.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    r_sphere = 0.5
    center = np.zeros(3, np.float32)

    vol = TSDFVolume(origin=center - 0.8, resolution=(64, 64, 64),
                     voxel_size=1.6 / 64)

    # cameras on a circle looking at the origin
    for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        c = np.array([2.0 * np.sin(ang), 0.0, 2.0 * np.cos(ang)],
                     np.float32)
        fwd = (center - c)
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        Rm = np.stack([right, upv, fwd])         # world->cam rows
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = Rm
        w2c[:3, 3] = -Rm @ c

        # analytic sphere depth map
        us, vs = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        dirs = np.stack([(us - W / 2) / f, (vs - H / 2) / f,
                         np.ones_like(us)], -1)
        dirs_w = dirs @ Rm                        # cam->world (R^T rows)
        oc = c - center
        b = (dirs_w * oc).sum(-1)
        cc = (oc * oc).sum() - r_sphere ** 2
        disc = b * b - (dirs_w * dirs_w).sum(-1) * cc
        thit = np.where(disc > 0,
                        (-b - np.sqrt(np.maximum(disc, 0)))
                        / (dirs_w * dirs_w).sum(-1), 0.0)
        depth = np.where(disc > 0, thit * dirs[..., 2] /
                         np.linalg.norm(dirs, axis=-1) *
                         np.linalg.norm(dirs, axis=-1), 0.0)  # z = t*dz
        depth = np.where(disc > 0, thit * 1.0, 0.0) * dirs[..., 2]
        vol.integrate(depth.astype(np.float32), w2c, K,
                      depth_trunc=5.0)

    verts, faces = vol.extract_mesh()
    assert len(verts) > 200, "fusion produced no surface"
    r = np.linalg.norm(verts - center, axis=-1)
    assert abs(np.median(r) - r_sphere) < 0.08
    out = str(tmp_path / "m.ply")
    save_mesh_ply(out, verts, faces)
    head = open(out, "rb").read(64)
    assert head.startswith(b"ply")


def test_gs2d_mesh_extraction_tool(tmp_path):
    """e2e: short 2DGS fit -> tools/gs2d_mesh_extraction.py produces a
    mesh artifact (VERDICT round-2 item 7)."""
    import subprocess, sys, os
    sys.path.insert(0, "tests")
    from test_fit_e2e import _make_dataset
    ds = str(tmp_path / "ds")
    _make_dataset(ds, n_views=6)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "main.py", "fit", "--config",
         "gsl_tpu/configs/gs2d.yaml", "--data.path", ds, "-n", "run",
         "--output", out, "--max_steps", "30",
         "data.parser.init_args.random_point_count=1500",
         "model.gaussian.sh_degree=0", "fit.min_capacity=2048",
         "fit.capacity_multiplier=1.0", "fit.save_iterations=[20]",
         "fit.log_interval=10", "data.parser.class_path=Blender"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "tools/gs2d_mesh_extraction.py",
         os.path.join(out, "run"), "--resolution", "48",
         "--alpha-thres", "0.2"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    mesh = os.path.join(out, "run", "mesh.ply")
    assert os.path.isfile(mesh)
    assert b"element face" in open(mesh, "rb").read(300)

"""PartitionStore distance factors test."""
import numpy as np
import jax.numpy as jnp

from gsl_tpu.models.gaussian import VanillaGaussianConfig
from gsl_tpu.training.stores import PartitionStoreConfig, VanillaStoreConfig
from gsl_tpu.utils.partitioning import build_partitions


def test_partition_store_distance(tmp_path):
    rng = np.random.RandomState(0)
    centers = rng.uniform(-10, 10, (40, 3))
    scene = build_partitions(centers, n_partitions_hint=4)
    path = str(tmp_path / "partitions.npz")
    scene.save(path)

    store = PartitionStoreConfig(partitions_path=path,
                                 partition_idx=0).instantiate()
    part = store.partition
    cx = (part.xy_min + part.xy_max) / 2.0

    # gaussians at the cell center (0) and far outside (>0)
    xyz = np.array([
        [cx[0], 0.0, cx[1]],                  # inside (up axis y)
        [part.xy_max[0] + 50, 0.0, cx[1]],    # way outside in x
    ], np.float32)
    state = VanillaGaussianConfig(sh_degree=0).init_from_pcd(
        xyz, np.full((2, 3), 0.5, np.float32), capacity=4)
    d = np.asarray(store.distance_factors(state))
    assert d[0] == 0.0
    assert d[1] > 1.0

    assert VanillaStoreConfig().instantiate().distance_factors(state) is None


def test_point_projection_visibility_assignment():
    """With full cameras, a camera LOOKING AT a far cell's points joins it
    (reference partitioning_utils.py:740-868); a camera looking away does
    not — the distance proxy cannot make that distinction."""
    import numpy as np
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.utils.partitioning import SceneConfig, build_partitions

    # two clusters of points along +x (cells around x=0 and x=4), up=y
    rng = np.random.RandomState(0)
    base = rng.rand(200, 3) * 0.5 + np.array([0.0, 0.0, -1.7])
    pts = np.concatenate([
        base, base + np.array([4.0, 0.0, 0.0])]).astype(np.float32)

    def look_at(pos, target):
        fwd = np.asarray(target, np.float64) - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd])
        return make_camera(R=R, T=-R @ np.asarray(pos), fx=60., fy=60.,
                           cx=32., cy=32., width=64, height=64)

    import jax
    # cameras clustered near cell A; one of them LOOKS at cell B
    cam_list = [look_at([0.2, 0.1, -3.0], [0.2, 0.1, -1.5]),
                look_at([0.4, 0.1, -3.0], [0.2, 0.1, -1.5]),
                look_at([0.3, 0.2, -3.0], [4.2, 0.1, -1.5]),   # -> cell B
                look_at([4.2, 0.1, -3.0], [4.2, 0.1, -1.5])]
    cams = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *cam_list)
    centers = np.stack([np.asarray(cams[i].camera_center)
                        for i in range(4)])
    cfg = SceneConfig(partition_size=3.0, origin=np.array([0.0, -3.0]),
                      visibility_based_distance=5.0,
                      visibility_threshold=0.5)
    scene = build_partitions(centers, pts, config=cfg, cameras=cams)
    # find the cell containing x~4
    cell_b = [p for p in scene.partitions
              if p.xy_min[0] <= 4.0 < p.xy_max[0]]
    assert cell_b, [(p.xy_min, p.xy_max) for p in scene.partitions]
    mask_b = cell_b[0].camera_mask
    assert mask_b[2], "camera looking at cell B must be assigned to it"
    assert mask_b[3]
    assert not mask_b[0] and not mask_b[1], \
        "cameras looking away must not join cell B"

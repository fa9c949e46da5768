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


def test_convex_hull_visibility_assignment():
    """Convex-hull visibility (reference partitioning_utils.py:740-868
    variant): a camera whose image is substantially covered by the
    projected hull of a cell's points joins the cell; a camera looking
    away does not. Also unit-checks the polygon clip."""
    import numpy as np
    from gsl_tpu.data.cameras import make_camera
    from gsl_tpu.utils.partitioning import (SceneConfig, _clip_polygon,
                                            _hull_visibility,
                                            build_partitions)

    # clip unit square shifted half out of a 1x1 window -> area 0.5
    poly = np.array([[-0.5, 0.0], [0.5, 0.0], [0.5, 1.0], [-0.5, 1.0]])
    clipped = _clip_polygon(poly, 1.0, 1.0)
    from gsl_tpu.utils.partitioning import _poly_area
    assert abs(_poly_area(clipped) - 0.5) < 1e-6

    # hull of points projected across the whole image -> visibility ~1
    u = np.array([-10.0, 70.0, -10.0, 70.0, 30.0])
    v = np.array([-10.0, -10.0, 70.0, 70.0, 30.0])
    assert _hull_visibility(u, v, 64, 64) > 0.99
    assert _hull_visibility(u[:2], v[:2], 64, 64) == 0.0

    rng = np.random.RandomState(0)
    # two camera clusters along x; points concentrated near cluster 0
    centers = np.concatenate([
        rng.normal([-4, 0, 0], 0.1, (5, 3)),
        rng.normal([4, 0, 0], 0.1, (5, 3))])
    pts = rng.normal([-4, 0, 4], 0.3, (300, 3)).astype(np.float32)
    cams = []
    for i, c in enumerate(centers):
        # all look toward +z from their position
        cams.append(make_camera(R=np.eye(3), T=-np.asarray(c),
                                fx=60.0, fy=60.0, cx=32, cy=32,
                                width=64, height=64))
    from gsl_tpu.data.cameras import Cameras
    import jax.numpy as jnp
    import jax
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(
        [jnp.asarray(x) for x in xs]), *cams)
    cfg = SceneConfig(visibility_mode="convex_hull",
                      visibility_threshold=1.0 / 9.0,
                      location_based_enlarge=0.01,
                      visibility_based_distance=3.0)
    scene = build_partitions(centers, pts, config=cfg, cameras=cam_batch,
                             n_partitions_hint=2)
    # the cell containing the points must include cameras of cluster 0
    # via the hull test; cluster-1 cameras see the points off-center and
    # small (or not at all)
    cell_with_pts = max(scene.partitions,
                        key=lambda p: int(p.camera_mask[:5].sum()))
    assert cell_with_pts.camera_mask[:5].sum() >= 4

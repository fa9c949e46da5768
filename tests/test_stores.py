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

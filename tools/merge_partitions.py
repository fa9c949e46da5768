"""Merge per-partition trained models into one PLY.

Analogue of /root/reference/utils/merge_partitions_v2.py:1-383: each
partition contributes only the gaussians whose centers fall inside its own
cell (ownership by position), then everything is concatenated.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("partitions_dir")
    ap.add_argument("--output", "-o", default=None)
    args = ap.parse_args()

    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    from gsl_tpu.utils.partitioning import (PartitionedScene,
                                            gaussians_in_partition)
    from gsl_tpu.utils.ply import save_gaussian_ply

    scene = PartitionedScene.load(
        os.path.join(args.partitions_dir, "partitions.npz"))
    merged = {}
    for pi, part in enumerate(scene.partitions):
        run_dir = os.path.join(args.partitions_dir, f"partition_{pi:03d}")
        if not os.path.isdir(run_dir):
            continue
        try:
            state, _, _ = GaussianModelLoader.load(run_dir)
        except FileNotFoundError:
            print(f"partition {pi}: no artifact, skip")
            continue
        alive = np.asarray(state.alive)
        means = np.asarray(state.params.means)[alive]
        own = gaussians_in_partition(means, part, scene.rotation)
        print(f"partition {pi}: {own.sum()}/{alive.sum()} owned")
        arrays = dict(
            means=means[own],
            scales=np.asarray(state.params.scales)[alive][own],
            rotations=np.asarray(state.params.rotations)[alive][own],
            opacities=np.asarray(state.params.opacities)[alive][own],
            shs_dc=np.asarray(state.params.shs_dc)[alive][own],
            shs_rest=np.asarray(state.params.shs_rest)[alive][own],
        )
        for k, v in arrays.items():
            merged.setdefault(k, []).append(v)

    if not merged:
        raise SystemExit("nothing to merge")
    cat = {k: np.concatenate(v) for k, v in merged.items()}
    out = args.output or os.path.join(args.partitions_dir, "merged.ply")
    save_gaussian_ply(out, cat["means"], cat["scales"], cat["rotations"],
                      cat["opacities"], cat["shs_dc"], cat["shs_rest"])
    print(f"wrote {cat['means'].shape[0]} gaussians to {out}")


if __name__ == "__main__":
    main()

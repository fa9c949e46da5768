"""Partition training driver: one `main.py fit` subprocess per partition.

Analogue of /root/reference/utils/train_partitions.py:24-541 — builds
partitions from the Colmap model (if partitions.npz absent), auto-scales
hyperparameters by per-partition image count, runs sequential/parallel
subprocesses with retries, and skips already-trained partitions.
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_path")
    ap.add_argument("--output", "-o", default="outputs/partitions")
    ap.add_argument("--config", action="append", default=[])
    ap.add_argument("--n-partitions", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=30000)
    ap.add_argument("--scale-mode", default="linear",
                    choices=["linear", "sqrt", "none"])
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--hosts", type=int, default=1,
                    help="total hosts in a per-host scale-out: host i "
                         "trains partitions with index %% hosts == i "
                         "(the TPU analogue of one srun task per node, "
                         "reference scripts/train-meganerf_rubble-"
                         "partitions.slurm)")
    ap.add_argument("--host-id", type=int, default=0)
    args = ap.parse_args()

    from gsl_tpu.data.dataparsers.colmap import ColmapDataParserConfig
    from gsl_tpu.utils.partitioning import (PartitionedScene,
                                            auto_hyper_parameter,
                                            build_partitions)

    outputs = ColmapDataParserConfig(
        path=args.dataset_path).instantiate().get_outputs()
    cams = outputs.train_set.cameras
    centers = np.stack([np.asarray(cams[i].camera_center)
                        for i in range(len(outputs.train_set))])

    part_file = os.path.join(args.output, "partitions.npz")
    if os.path.exists(part_file):
        scene = PartitionedScene.load(part_file)
    else:
        scene = build_partitions(centers, outputs.point_cloud.xyz,
                                 n_partitions_hint=args.n_partitions,
                                 cameras=cams)
        scene.save(part_file)
    print(f"{len(scene.partitions)} partitions")

    names = outputs.train_set.image_names
    for pi, part in enumerate(scene.partitions):
        if pi % args.hosts != args.host_id:
            continue
        run_dir = os.path.join(args.output, f"partition_{pi:03d}")
        done_marker = os.path.join(run_dir, "TRAINED")
        if os.path.exists(done_marker):
            print(f"partition {pi}: already trained, skip")
            continue
        image_list = [names[i] for i in np.nonzero(part.camera_mask)[0]]
        if len(image_list) < 3:
            print(f"partition {pi}: too few cameras ({len(image_list)})")
            continue
        os.makedirs(run_dir, exist_ok=True)
        list_path = os.path.join(run_dir, "image_list.txt")
        with open(list_path, "w") as f:
            f.write("\n".join(image_list))

        scaled, scale_up = auto_hyper_parameter(
            len(image_list), scale_mode=args.scale_mode,
            max_steps=args.max_steps)
        cmd = [sys.executable, "main.py", "fit",
               "--data.path", args.dataset_path,
               "--output", args.output, "-n", f"partition_{pi:03d}",
               f"data.parser.init_args.image_list={list_path}",
               f"fit.max_steps={scaled['max_steps']}",
               f"trainer.max_steps={scaled['max_steps']}",
               "model.density.densification_interval="
               f"{scaled['densification_interval']}",
               "model.density.opacity_reset_interval="
               f"{scaled['opacity_reset_interval']}",
               "model.density.densify_from_iter="
               f"{scaled['densify_from_iter']}",
               "model.density.densify_until_iter="
               f"{scaled['densify_until_iter']}",
               ]
        for c in args.config:
            cmd += ["--config", c]
        print(f"partition {pi}: {len(image_list)} images, "
              f"scale_up={scale_up}")
        if args.dry_run:
            print(" ", " ".join(cmd))
            continue
        ok = False
        for attempt in range(args.retries + 1):
            r = subprocess.run(cmd, cwd=os.path.join(
                os.path.dirname(__file__), ".."))
            if r.returncode == 0:
                ok = True
                break
            print(f"partition {pi} attempt {attempt} failed "
                  f"(rc={r.returncode})")
        if ok:
            with open(done_marker, "w") as f:
                f.write("ok")


if __name__ == "__main__":
    main()

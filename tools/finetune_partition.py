"""Finetune one (optionally pruned) partition model.

Analogue of /root/reference/utils/finetune_partition.py: continue training a
partition from its trained/pruned artifact (fresh optimizer state, short
schedule) so LoD levels recover quality after pruning.

Usage:
    python tools/finetune_partition.py runs/parts 0 --src lod1 \
        --steps 2000 [--extra key=value ...]
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("partitions_dir")
    ap.add_argument("partition", type=int)
    ap.add_argument("--src", default="lod1",
                    help="LoD subdir holding the artifact to finetune")
    ap.add_argument("--base", default=".",
                    help="subdir holding the original run (config.yaml)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    pname = f"partition_{args.partition:03d}"
    src_dir = os.path.join(args.partitions_dir, args.src, pname)
    snap = os.path.join(args.partitions_dir, args.base, pname,
                        "config.yaml")
    if not os.path.isfile(snap):
        raise SystemExit(f"no config snapshot at {snap}")
    out_dir = os.path.join(args.partitions_dir, args.src + "_ft")

    cmd = [sys.executable, "-u",
           os.path.join(os.path.dirname(__file__), "..", "main.py"),
           "fit", "--config", snap,
           "--output", out_dir, "-n", pname,
           "--max_steps", str(args.steps),
           f"fit.init_from={src_dir}",
           "fit.resume=never",
           "fit.save_iterations=[]"] + list(args.extra)
    print(" ".join(cmd))
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()

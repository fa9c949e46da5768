"""Benchmark-style evaluation over a list of trained scenes.

The analogue of the reference eval CLIs
(/root/reference/utils/eval_blender.py, utils/eval_mipnerf360.py), which
run validate over the standard scene lists and summarize mean
PSNR/SSIM/LPIPS per scene + overall. Here each scene is a run directory
produced by `main.py fit -n <scene>`; evaluation reuses the standard CLI
validate path (auto ckpt search + the run's own config snapshot), then the
per-scene MEAN rows are collected into one reference-style table.

Usage:
  python tools/eval_scenes.py --output outputs --scenes lego chair drums
      [--split val|test] [--out summary.csv]
"""
import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_mean_row(csv_path):
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    for r in rows:
        if r and r[0] == "MEAN":
            psnr = float(r[1])
            ssim = float(r[2])
            lpips = float(r[3]) if len(r) > 3 and r[3] not in ("", None) \
                else float("nan")
            return psnr, ssim, lpips
    raise ValueError(f"no MEAN row in {csv_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="outputs",
                    help="runs root (each scene is a run dir under it)")
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument("--out", default=None,
                    help="summary CSV path (default <output>/eval_summary"
                         ".csv)")
    ap.add_argument("--skip-validate", action="store_true",
                    help="only aggregate existing metrics CSVs")
    args = ap.parse_args(argv)

    import gsl_tpu  # noqa: F401
    from gsl_tpu.cli import main as cli_main

    sub = "validate" if args.split == "val" else "test"
    results = []
    for scene in args.scenes:
        run_dir = os.path.join(args.output, scene)
        csv_path = os.path.join(run_dir, "metrics", f"{args.split}.csv")
        if not args.skip_validate:
            cli_main([sub, "-n", scene, "--output", args.output])
        results.append((scene,) + read_mean_row(csv_path))

    print(f"\n| scene | PSNR | SSIM | LPIPS |")
    print("|---|---|---|---|")
    for scene, p, s, l in results:
        ls = f"{l:.4f}" if l == l else "-"
        print(f"| {scene} | {p:.2f} | {s:.4f} | {ls} |")
    mp = float(np.mean([r[1] for r in results]))
    ms = float(np.mean([r[2] for r in results]))
    lv = [r[3] for r in results if r[3] == r[3]]
    ml = float(np.mean(lv)) if lv else float("nan")
    print(f"| MEAN | {mp:.2f} | {ms:.4f} | "
          f"{(f'{ml:.4f}' if ml == ml else '-')} |")

    out = args.out or os.path.join(args.output, "eval_summary.csv")
    with open(out, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["scene", "psnr", "ssim", "lpips"])
        wr.writerows(results)
        wr.writerow(["MEAN", mp, ms, ml])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Merge multiple gaussian PLY exports into one
(reference /root/reference/utils/merge_ply.py: concatenates the Inria-layout
property arrays of N plys).

Usage: python tools/merge_ply.py out.ply in1.ply in2.ply [...]
       [--max-sh-degree 3]

Inputs may have mixed SH degrees (a lower-degree ply is zero-padded up to
the largest band count present, the same up-conversion the multi-model
editor applies).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def merge_plys(paths):
    from gsl_tpu.utils.ply import load_gaussian_ply
    parts = [load_gaussian_ply(p) for p in paths]
    max_rest = max(p["shs_rest"].shape[1] for p in parts)
    for p in parts:
        k = p["shs_rest"].shape[1]
        if k < max_rest:
            p["shs_rest"] = np.concatenate(
                [p["shs_rest"],
                 np.zeros((p["means"].shape[0], max_rest - k, 3),
                          np.float32)], axis=1)
    return {k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("inputs", nargs="+")
    args = ap.parse_args(argv)

    from gsl_tpu.utils.ply import save_gaussian_ply
    merged = merge_plys(args.inputs)
    save_gaussian_ply(args.output, merged["means"], merged["scales"],
                      merged["rotations"], merged["opacities"],
                      merged["shs_dc"], merged["shs_rest"])
    print(f"merged {len(args.inputs)} plys -> {args.output} "
          f"({merged['means'].shape[0]} gaussians)")


if __name__ == "__main__":
    main()

"""Convert a training checkpoint to an Inria-layout PLY.

Analogue of /root/reference/utils/ckpt2ply.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_path", help="run dir or checkpoint dir")
    ap.add_argument("--output", "-o", default=None)
    args = ap.parse_args()

    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    from gsl_tpu.utils.ply import save_state_ply

    state, _, _ = GaussianModelLoader.load(args.model_path)
    out = args.output or os.path.join(args.model_path, "exported.ply")
    n = save_state_ply(out, state)
    print(f"wrote {n} gaussians to {out}")


if __name__ == "__main__":
    main()

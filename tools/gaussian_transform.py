"""Rigid-transform a trained gaussian artifact (SH-preserving).

Reference: /root/reference/utils/gaussian_transform.py driving
GaussianTransformUtils (internal/utils/gaussian_utils.py:257-427 —
rotation rotates means + quats AND the SH bands via Wigner-like matrices,
uniform scale rescales means + log-scales). Here the math lives in
gsl_tpu/utils/gaussian_transforms.py (rotate_state / translate_state /
scale_state).

Usage:
  python tools/gaussian_transform.py in.ply out.ply \
      [--rotate-euler RX RY RZ (degrees, XYZ order)] \
      [--translate TX TY TZ] [--scale S]

Input may be a .ply or a run dir / checkpoint (auto-searched).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def euler_to_R(rx, ry, rz):
    a, b, c = np.deg2rad([rx, ry, rz])
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)],
                   [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(c), -np.sin(c), 0],
                   [np.sin(c), np.cos(c), 0],
                   [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--rotate-euler", type=float, nargs=3, default=None,
                    metavar=("RX", "RY", "RZ"))
    ap.add_argument("--translate", type=float, nargs=3, default=None,
                    metavar=("TX", "TY", "TZ"))
    ap.add_argument("--scale", type=float, default=None)
    args = ap.parse_args(argv)

    import gsl_tpu  # noqa: F401
    from gsl_tpu.models.gaussian import GaussianState
    from gsl_tpu.utils.gaussian_transforms import (rotate_state,
                                                   scale_state,
                                                   translate_state)
    from gsl_tpu.utils.ply import save_state_ply

    if args.input.endswith(".ply"):
        from gsl_tpu.utils.gaussian_model_loader import state_from_raw_arrays
        from gsl_tpu.utils.ply import load_gaussian_ply
        state = state_from_raw_arrays(load_gaussian_ply(args.input))
    else:
        from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
        state, _, _ = GaussianModelLoader.load(args.input)

    # reference order: rescale, then rotate, then translate
    # (utils/gaussian_transform.py applies scale/rotation/offset)
    if args.scale is not None and args.scale != 1.0:
        state = scale_state(state, args.scale)
    if args.rotate_euler is not None:
        state = rotate_state(state, euler_to_R(*args.rotate_euler))
    if args.translate is not None:
        state = translate_state(state, np.asarray(args.translate,
                                                  np.float32))

    n = save_state_ply(args.output, state)
    print(f"wrote {args.output} ({n} gaussians)")


if __name__ == "__main__":
    main()

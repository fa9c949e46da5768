"""Convert a gaussian PLY / checkpoint to the antimatter15 .splat format.

Reference: /root/reference/utils/convert2splat.py — 32 bytes per gaussian:
  position  3 x f32
  scale     3 x f32 (activated, exp)
  color     4 x u8  (SH DC -> rgb via C0, opacity -> sigmoid)
  rotation  4 x u8  (normalized quat, mapped [-1, 1] -> [0, 255])
sorted by descending importance = sigmoid(opacity) * volume (exp-scale
product), which is what web splat viewers expect.

Usage: python tools/convert2splat.py input(.ply|run dir) output.splat
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SH_C0 = 0.28209479177387814


def state_to_splat_bytes(means, scales_log, rotations, opacities_raw,
                         shs_dc):
    n = means.shape[0]
    scales = np.exp(scales_log)
    opac = 1.0 / (1.0 + np.exp(-opacities_raw.reshape(n)))
    rgb = np.clip(shs_dc.reshape(n, -1)[:, :3] * SH_C0 + 0.5, 0.0, 1.0)
    q = rotations / np.maximum(
        np.linalg.norm(rotations, axis=-1, keepdims=True), 1e-12)

    importance = opac * scales.prod(axis=-1)
    order = np.argsort(-importance)

    buf = np.zeros((n, 32), np.uint8)
    buf[:, 0:12] = means[order].astype(np.float32).view(np.uint8).reshape(
        n, 12)
    buf[:, 12:24] = scales[order].astype(np.float32).view(
        np.uint8).reshape(n, 12)
    buf[:, 24:27] = (rgb[order] * 255).astype(np.uint8)
    buf[:, 27] = (opac[order] * 255).astype(np.uint8)
    buf[:, 28:32] = np.clip(q[order] * 128 + 128, 0, 255).astype(np.uint8)
    return buf.tobytes()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)

    import gsl_tpu  # noqa: F401
    if args.input.endswith(".ply"):
        from gsl_tpu.utils.ply import load_gaussian_ply
        raw = load_gaussian_ply(args.input)
    else:
        from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
        state, _, _ = GaussianModelLoader.load(args.input)
        alive = np.asarray(state.alive)
        p = state.params
        raw = dict(means=np.asarray(p.means)[alive],
                   scales=np.asarray(p.scales)[alive],
                   rotations=np.asarray(p.rotations)[alive],
                   opacities=np.asarray(p.opacities)[alive],
                   shs_dc=np.asarray(p.shs_dc)[alive])

    data = state_to_splat_bytes(raw["means"], raw["scales"],
                                raw["rotations"], raw["opacities"],
                                raw["shs_dc"])
    with open(args.output, "wb") as f:
        f.write(data)
    print(f"wrote {args.output} ({len(data) // 32} gaussians, "
          f"{len(data)} bytes)")


if __name__ == "__main__":
    main()

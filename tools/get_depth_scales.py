"""Solve per-image scale/shift aligning estimated inverse depth to COLMAP.

Analogue of /root/reference/utils/get_depth_scales.py: for each image,
project its visible COLMAP sparse points to get metric depths, sample the
estimated inverse-depth map at those pixels, and least-squares solve
`1/z ~ a * d_est + b`. Writes `estimated_depth_scales.json`, consumed by
the EstimatedDepthColmap dataparser for depth-regularized training.

Usage: python tools/get_depth_scales.py <dataset> --depth-dir estimated_depths
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--depth-dir", default="estimated_depths")
    ap.add_argument("--min-points", type=int, default=10)
    args = ap.parse_args()

    from gsl_tpu.data.colmap_io import qvec_to_rotmat, read_model

    sparse = None
    for cand in ("sparse/0", "sparse"):
        if os.path.isdir(os.path.join(args.path, cand)):
            sparse = os.path.join(args.path, cand)
            break
    if sparse is None:
        raise SystemExit(f"no COLMAP sparse model under {args.path}")
    model = read_model(sparse)

    scales = {}
    xyz = model.points_xyz

    for im in model.images.values():
        stem = im.name[:im.name.rfind(".")] if "." in im.name else im.name
        dpath = os.path.join(args.path, args.depth_dir, stem + ".npy")
        if not os.path.isfile(dpath):
            continue
        d_est = np.load(dpath)          # [H, W] inverse depth (monocular)
        cam = model.cameras[im.camera_id]
        R = qvec_to_rotmat(im.qvec)
        t = im.tvec

        p_cam = xyz @ R.T + t
        z = p_cam[:, 2]
        ok = z > 0.01
        p_cam = p_cam[ok]
        z = z[ok]
        u = cam.fx * p_cam[:, 0] / z + cam.cx
        v = cam.fy * p_cam[:, 1] / z + cam.cy
        H, W = d_est.shape[:2]
        sx = W / cam.width
        sy = H / cam.height
        ui = np.round(u * sx).astype(int)
        vi = np.round(v * sy).astype(int)
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        if inb.sum() < args.min_points:
            continue
        d_sampled = d_est[vi[inb], ui[inb]].astype(np.float64)
        inv_z = 1.0 / z[inb]
        # trimmed least squares inv_z = a * d + b (points.bin carries no
        # per-image tracks here, so occluded samples are rejected by
        # dropping the worst-residual 20% and refitting)
        A = np.stack([d_sampled, np.ones_like(d_sampled)], 1)
        (a, b), *_ = np.linalg.lstsq(A, inv_z, rcond=None)
        resid = np.abs(A @ [a, b] - inv_z)
        keep = resid <= np.quantile(resid, 0.8)
        if keep.sum() >= args.min_points:
            (a, b), *_ = np.linalg.lstsq(A[keep], inv_z[keep], rcond=None)
        scales[im.name] = {"scale": float(a), "offset": float(b)}

    out = os.path.join(args.path, "estimated_depth_scales.json")
    with open(out, "w") as f:
        json.dump(scales, f, indent=2)
    print(f"wrote {out}: {len(scales)} images")


if __name__ == "__main__":
    main()

"""Detect outlier SfM camera registrations in a COLMAP model.

Analogue of /root/reference/internal/utils/sfm_outlier_detection.py (which
filters poses against GPS EXIF priors and 3D-point support). Without GPS
priors, two robust signals still catch most mis-registrations:

1. 3D-point support: images whose frustum sees almost none of the sparse
   cloud (reference filter_by_number_of_3d_points),
2. positional outliers: camera centers far from the cluster in robust
   (median / MAD) units.

With `--gps-priors poses.json` ({image_name: [lat_m, lon_m, alt_m]} in any
consistent metric frame), a similarity transform is solved (Umeyama) and
images whose residual exceeds `--gps-threshold` are also flagged.

Writes `<path>/sfm_outliers.txt` (one image name per line) — feed it to
the colmap parser's image exclusion, or delete and re-triangulate.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def umeyama(src, dst):
    """Least-squares similarity transform src -> dst ([N,3] each)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (sc ** 2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / max(var, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--min-point-fraction", type=float, default=0.02,
                    help="flag images seeing under this fraction of the "
                         "median in-frustum point count")
    ap.add_argument("--position-mads", type=float, default=8.0)
    ap.add_argument("--gps-priors", default=None)
    ap.add_argument("--gps-threshold", type=float, default=3.0,
                    help="x median residual")
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
    xyz = model.points_xyz

    names, centers, support = [], [], []
    for im in model.images.values():
        R = qvec_to_rotmat(im.qvec)
        t = im.tvec
        cam = model.cameras[im.camera_id]
        p_cam = xyz @ R.T + t
        z = p_cam[:, 2]
        ok = z > 0.01
        u = cam.fx * p_cam[ok, 0] / z[ok] + cam.cx
        v = cam.fy * p_cam[ok, 1] / z[ok] + cam.cy
        inb = ((u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height))
        names.append(im.name)
        centers.append(-R.T @ t)
        support.append(int(inb.sum()))
    centers = np.stack(centers)
    support = np.asarray(support, np.float64)

    outliers = {}

    med_support = max(np.median(support), 1.0)
    for n, s in zip(names, support):
        if s < args.min_point_fraction * med_support:
            outliers.setdefault(n, []).append(
                f"point support {int(s)} << median {int(med_support)}")

    med = np.median(centers, axis=0)
    mad = np.median(np.abs(centers - med), axis=0) + 1e-9
    dev = np.max(np.abs(centers - med) / mad, axis=-1)
    for n, d in zip(names, dev):
        if d > args.position_mads:
            outliers.setdefault(n, []).append(
                f"position {d:.1f} MADs from cluster")

    if args.gps_priors:
        with open(args.gps_priors) as f:
            priors = json.load(f)
        both = [i for i, n in enumerate(names) if n in priors]
        if len(both) >= 3:
            gps = np.asarray([priors[names[i]] for i in both], np.float64)
            s_, R_, t_ = umeyama(centers[both], gps)
            resid = np.linalg.norm(
                (s_ * centers[both] @ R_.T + t_) - gps, axis=-1)
            thr = args.gps_threshold * max(np.median(resid), 1e-9)
            for i, r in zip(both, resid):
                if r > thr:
                    outliers.setdefault(names[i], []).append(
                        f"gps residual {r:.2f} > {thr:.2f}")

    out = os.path.join(args.path, "sfm_outliers.txt")
    with open(out, "w") as f:
        for n in sorted(outliers):
            f.write(n + "\n")
    for n in sorted(outliers):
        print(f"{n}: " + "; ".join(outliers[n]))
    print(f"{len(outliers)}/{len(names)} flagged -> {out}")


if __name__ == "__main__":
    main()

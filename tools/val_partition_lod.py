"""Evaluate a partitioned scene through the LoD renderer.

Analogue of /root/reference/utils/val_partition_lod.py:1-283: renders the
validation (or train) cameras through PartitionLoDRenderer, records
PSNR/SSIM, assembled gaussian count and per-frame level selections.

Usage:
    python tools/val_partition_lod.py runs/parts --names . lod1 \
        --lod-distances 2 --config runs/parts/partition_000/config.yaml \
        [--split val] [--visibility-filter]
"""
import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("partitions_dir")
    ap.add_argument("--names", nargs="+", required=True,
                    help="LoD subdirs, finest first ('.' = driver output)")
    ap.add_argument("--lod-distances", nargs="*", type=float, default=[])
    ap.add_argument("--config", required=True,
                    help="config.yaml snapshot providing the dataset")
    ap.add_argument("--split", default="val", choices=["val", "train",
                                                       "test"])
    ap.add_argument("--visibility-filter", action="store_true")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gsl_tpu.cli import build_components, load_config
    from gsl_tpu.data.dataset import CachedDataset
    from gsl_tpu.ops.ssim import ssim as ssim_fn
    from gsl_tpu.renderers.partition_lod import PartitionLoDConfig

    cfg = load_config([args.config], {})
    _, dataparser_cfg, _ = build_components(cfg)
    outputs = dataparser_cfg.instantiate().get_outputs()
    image_set = {"val": outputs.val_set, "train": outputs.train_set,
                 "test": outputs.test_set}[args.split]

    lod = PartitionLoDConfig(
        data=args.partitions_dir, names=args.names,
        lod_distances=args.lod_distances,
        visibility_filter=args.visibility_filter,
    ).instantiate().setup()

    bg = jnp.zeros(3, jnp.float32)
    dataset = CachedDataset(image_set, background=np.zeros(3, np.float32))
    rows = []
    for i in range(len(dataset)):
        cam, name, img, _ = dataset.get(i)
        H, W = img.shape[:2]
        out, stats = lod.forward(cam, H, W, bg)
        render = np.asarray(out.render)
        mse = float(np.mean((render - img) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        s = float(ssim_fn(jnp.asarray(img).transpose(2, 0, 1),
                          jnp.asarray(render).transpose(2, 0, 1)))
        levels = ";".join(str(int(x)) for x in stats["partition_lods"])
        rows.append([name, psnr, s, stats["n_gaussians"], levels])
        print(f"{name}: psnr={psnr:.2f} ssim={s:.4f} "
              f"n={stats['n_gaussians']} lods=[{levels}]")

    out_path = args.output or os.path.join(args.partitions_dir,
                                           f"lod_{args.split}.csv")
    with open(out_path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["name", "psnr", "ssim", "n_gaussians", "lods"])
        wr.writerows(rows)
        wr.writerow(["MEAN", float(np.mean([r[1] for r in rows])),
                     float(np.mean([r[2] for r in rows])), "", ""])
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

"""Export LPIPS(alex) pretrained weights to the npz format gsl_tpu reads.

Run this ONCE on a machine with internet access and `lpips` (or
torchmetrics) installed, then copy the npz next to the repo:

    python tools/export_lpips_weights.py --out weights/lpips_alex.npz

gsl_tpu validation (`gsl_tpu/ops/lpips.py`) picks it up automatically from
`weights/lpips_alex.npz` or `$GSL_LPIPS_WEIGHTS`.
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_alex.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg  # pip install lpips
    import torch

    model = lpips_pkg.LPIPS(net="alex", spatial=False)
    out = {}
    # AlexNet conv layers live at net.slice{1..5}; map back to the
    # torchvision features.{0,3,6,8,10} naming our loader expects
    convs = []
    for slice_idx in range(1, 6):
        seq = getattr(model.net, f"slice{slice_idx}")
        for m in seq.modules():
            if isinstance(m, torch.nn.Conv2d):
                convs.append(m)
    feat_ids = (0, 3, 6, 8, 10)
    assert len(convs) == 5, len(convs)
    for fid, conv in zip(feat_ids, convs):
        out[f"features.{fid}.weight"] = conv.weight.detach().numpy()
        out[f"features.{fid}.bias"] = conv.bias.detach().numpy()
    for i in range(5):
        lin = getattr(model, f"lin{i}")
        out[f"lin.{i}.weight"] = lin.model[-1].weight.detach().numpy()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()

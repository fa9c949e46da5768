"""Estimate monocular inverse depth maps with Depth Anything V2.

Analogue of /root/reference/utils/run_depth_anything_v2.py: writes
`<path>/estimated_depths/<stem>.npy` ([H, W] relative inverse depth).
Follow with tools/get_depth_scales.py to solve per-image metric scales,
then train with the EstimatedDepthColmap parser + DepthMetrics preset.

Requires transformers + a LOCAL model directory (no weights ship here):
    python tools/run_depth_anything.py <path> \
        --model /models/depth-anything-v2-small
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--model", required=True,
                    help="local HF model dir (depth-anything v2)")
    ap.add_argument("--images-dir", default="images")
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    try:
        import torch
        from transformers import (AutoImageProcessor,
                                  AutoModelForDepthEstimation)
    except ImportError as e:
        raise SystemExit(f"transformers unavailable ({e})") from e
    from PIL import Image

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    processor = AutoImageProcessor.from_pretrained(args.model,
                                                   local_files_only=True)
    model = AutoModelForDepthEstimation.from_pretrained(
        args.model, local_files_only=True).to(device).eval()

    src = os.path.join(args.path, args.images_dir)
    out_dir = os.path.join(args.path, "estimated_depths")
    os.makedirs(out_dir, exist_ok=True)

    names = [f for f in sorted(os.listdir(src))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        with Image.open(os.path.join(src, name)) as im:
            img = im.convert("RGB")
            inputs = processor(images=img, return_tensors="pt").to(device)
            with torch.no_grad():
                depth = model(**inputs).predicted_depth[0]
            depth = torch.nn.functional.interpolate(
                depth[None, None], size=img.size[::-1], mode="bilinear",
                align_corners=False)[0, 0]
        stem = name[:name.rfind(".")]
        np.save(os.path.join(out_dir, stem + ".npy"),
                depth.cpu().numpy().astype(np.float32))
        print(f"[{i + 1}/{len(names)}] {name}")


if __name__ == "__main__":
    main()

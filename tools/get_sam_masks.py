"""Extract SAM segmentation masks (+ optional embeddings) for a dataset.

Analogue of /root/reference/utils/get_sam_masks.py: runs Segment Anything
automatic mask generation per image and writes
`<path>/semantic/masks/<name>.npz` ({"masks": [M, H, W] bool}) and
optionally `<path>/semantic/sam_features/<name>.npy` (the encoder's
[C, h, w] embedding, the Feature3DGS teacher). Consumed by the
SegAnyColmap / Feature3DGSColmap dataparsers.

Requires `segment-anything` and a local checkpoint (this runtime ships no
model weights — run wherever SAM is installed):
    pip install git+https://github.com/facebookresearch/segment-anything
    python tools/get_sam_masks.py <path> --checkpoint sam_vit_h_4b8939.pth
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model-type", default="vit_h")
    ap.add_argument("--images-dir", default="images")
    ap.add_argument("--embeddings", action="store_true",
                    help="also dump encoder embeddings (Feature3DGS)")
    ap.add_argument("--points-per-side", type=int, default=32)
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    try:
        import torch
        from segment_anything import (SamAutomaticMaskGenerator,
                                      sam_model_registry)
    except ImportError as e:
        raise SystemExit(
            f"segment-anything unavailable ({e}); install it and provide a "
            "local checkpoint — no weights ship with this repo") from e
    from PIL import Image

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    sam = sam_model_registry[args.model_type](checkpoint=args.checkpoint)
    sam.to(device)
    gen = SamAutomaticMaskGenerator(sam,
                                    points_per_side=args.points_per_side)

    src = os.path.join(args.path, args.images_dir)
    mask_dir = os.path.join(args.path, "semantic", "masks")
    feat_dir = os.path.join(args.path, "semantic", "sam_features")
    os.makedirs(mask_dir, exist_ok=True)
    if args.embeddings:
        os.makedirs(feat_dir, exist_ok=True)

    names = [f for f in sorted(os.listdir(src))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        with Image.open(os.path.join(src, name)) as im:
            img = np.asarray(im.convert("RGB"))
        anns = gen.generate(img)
        masks = np.stack([a["segmentation"] for a in anns]) if anns \
            else np.zeros((0,) + img.shape[:2], bool)
        np.savez_compressed(os.path.join(mask_dir, name + ".npz"),
                            masks=masks)
        if args.embeddings:
            with torch.no_grad():
                gen.predictor.set_image(img)
                emb = gen.predictor.get_image_embedding()[0].cpu().numpy()
            np.save(os.path.join(feat_dir, name + ".npy"), emb)
        print(f"[{i + 1}/{len(names)}] {name}: {masks.shape[0]} masks")


if __name__ == "__main__":
    main()

"""Downsample a COLMAP images directory into images_{factor}/.

Analogue of /root/reference/utils/image_downsample.py: writes
`<path>/images_<factor>/` mirroring `<path>/images/`, which the colmap
dataparser picks up via its down_sample_factor option.

Usage: python tools/image_downsample.py <dataset_path> --factor 4
"""
import argparse
import os

from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--factor", type=int, default=2)
    ap.add_argument("--images-dir", default="images")
    args = ap.parse_args()

    src = os.path.join(args.path, args.images_dir)
    dst = os.path.join(args.path, f"{args.images_dir}_{args.factor}")
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_dir = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            with Image.open(os.path.join(root, f)) as im:
                w, h = im.size
                im = im.resize((max(w // args.factor, 1),
                                max(h // args.factor, 1)),
                               Image.LANCZOS)
                im.save(os.path.join(out_dir, f))
            n += 1
    print(f"wrote {n} images to {dst}")


if __name__ == "__main__":
    main()

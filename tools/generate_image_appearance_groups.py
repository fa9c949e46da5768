"""Generate appearance group assignments for a dataset.

Analogue of /root/reference/utils/generate_image_apperance_groups.py:
writes `<path>/appearance_groups.json` mapping image name -> group id.
Grouping modes: `image` (one group per image, the PhotoTourism default),
`dir` (per subdirectory, e.g. per-camera rigs), `prefix` (first N chars).

Usage:
    python tools/generate_image_appearance_groups.py <dataset_path>
        [--mode image|dir|prefix] [--prefix-len 8]
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--images-dir", default="images")
    ap.add_argument("--mode", choices=["image", "dir", "prefix"],
                    default="image")
    ap.add_argument("--prefix-len", type=int, default=8)
    args = ap.parse_args()

    src = os.path.join(args.path, args.images_dir)
    names = []
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        for f in sorted(files):
            if f.lower().endswith((".png", ".jpg", ".jpeg")):
                names.append(f if rel == "." else os.path.join(rel, f))
    names.sort()

    def group_key(nm):
        if args.mode == "image":
            return nm
        if args.mode == "dir":
            return os.path.dirname(nm) or "."
        return os.path.basename(nm)[:args.prefix_len]

    keys = sorted({group_key(n) for n in names})
    key_to_id = {k: i for i, k in enumerate(keys)}
    groups = {n: key_to_id[group_key(n)] for n in names}

    out = os.path.join(args.path, "appearance_groups.json")
    with open(out, "w") as f:
        json.dump(groups, f, indent=2)
    print(f"wrote {out}: {len(names)} images in {len(keys)} groups")


if __name__ == "__main__":
    main()

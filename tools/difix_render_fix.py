"""Post-process rendered frames with a Difix-style diffusion fixer.

Analogue of /root/reference/internal/utils/pipeline_difix.py (1.1k LoC, a
single-step img2img diffusion pipeline the reference viewer uses to clean
up under-trained renders). The pipeline is reproduced as an offline CLI
over a LOCAL diffusers checkpoint (this runtime ships no weights): each
input frame is encoded, denoised for `--steps` steps at `--strength`
partial noise, and decoded — artifacts (floaters, fuzz) regress toward
the image manifold while structure is preserved.

Usage:
    python tools/difix_render_fix.py <frames_dir> --model /models/difix
        [--out fixed/] [--strength 0.2] [--steps 1] [--prompt ""]
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("frames_dir")
    ap.add_argument("--model", required=True,
                    help="local diffusers img2img-capable model dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--strength", type=float, default=0.2)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--prompt", default="")
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    try:
        import torch
        from diffusers import AutoPipelineForImage2Image
    except ImportError as e:
        raise SystemExit(
            f"diffusers unavailable ({e}); install it and point --model at "
            "a local checkpoint — no weights ship with this repo") from e
    from PIL import Image

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    pipe = AutoPipelineForImage2Image.from_pretrained(
        args.model, local_files_only=True).to(device)

    out_dir = args.out or os.path.join(args.frames_dir, "fixed")
    os.makedirs(out_dir, exist_ok=True)
    names = [f for f in sorted(os.listdir(args.frames_dir))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        with Image.open(os.path.join(args.frames_dir, name)) as im:
            img = im.convert("RGB")
        fixed = pipe(prompt=args.prompt, image=img,
                     strength=args.strength,
                     num_inference_steps=max(
                         args.steps, int(round(1 / args.strength))),
                     guidance_scale=1.0).images[0]
        fixed.save(os.path.join(out_dir, name))
        print(f"[{i + 1}/{len(names)}] {name}")


if __name__ == "__main__":
    main()

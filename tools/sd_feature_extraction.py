"""Extract Stable Diffusion UNet features per image (SpotLessSplats).

Analogue of /root/reference/utils/sd_feature_extraction.py (344 LoC): one
denoising step at a fixed timestep through a local SD model, capturing an
intermediate UNet up-block activation, bilinearly resized to 50x50 and
saved as `<path>/SD/<stem>.npy` ([1280, 50, 50] float16) — the robust-mask
MLP's input features (SpotLessColmap parser + SpotLessMetrics).

Requires diffusers + a LOCAL model dir (no weights ship here):
    python tools/sd_feature_extraction.py <path> --model /models/sd-2-1
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--model", required=True)
    ap.add_argument("--images-dir", default="images")
    ap.add_argument("--timestep", type=int, default=261)
    ap.add_argument("--block", type=int, default=1,
                    help="up_blocks index to capture")
    ap.add_argument("--size", type=int, default=50)
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    try:
        import torch
        from diffusers import AutoencoderKL, UNet2DConditionModel
        from transformers import CLIPTextModel, CLIPTokenizer
    except ImportError as e:
        raise SystemExit(f"diffusers/transformers unavailable ({e})") from e
    from PIL import Image

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    vae = AutoencoderKL.from_pretrained(args.model, subfolder="vae",
                                        local_files_only=True).to(device)
    unet = UNet2DConditionModel.from_pretrained(
        args.model, subfolder="unet", local_files_only=True).to(device)
    tokenizer = CLIPTokenizer.from_pretrained(
        args.model, subfolder="tokenizer", local_files_only=True)
    text_encoder = CLIPTextModel.from_pretrained(
        args.model, subfolder="text_encoder",
        local_files_only=True).to(device)

    captured = {}

    def hook(_m, _i, out):
        captured["feat"] = out

    unet.up_blocks[args.block].register_forward_hook(hook)

    with torch.no_grad():
        tokens = tokenizer([""], return_tensors="pt").input_ids.to(device)
        text_emb = text_encoder(tokens).last_hidden_state

    src = os.path.join(args.path, args.images_dir)
    out_dir = os.path.join(args.path, "SD")
    os.makedirs(out_dir, exist_ok=True)
    names = [f for f in sorted(os.listdir(src))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    for i, name in enumerate(names):
        with Image.open(os.path.join(src, name)) as im:
            img = im.convert("RGB").resize((512, 512))
        x = torch.from_numpy(np.asarray(img)).float().to(device)
        x = (x / 127.5 - 1.0).permute(2, 0, 1)[None]
        with torch.no_grad():
            latents = vae.encode(x).latent_dist.mean * 0.18215
            t = torch.tensor([args.timestep], device=device)
            noise = torch.randn_like(latents)
            noisy = latents + noise * 0.1
            unet(noisy, t, encoder_hidden_states=text_emb)
            feat = captured["feat"][0]
            feat = torch.nn.functional.interpolate(
                feat[None], size=(args.size, args.size),
                mode="bilinear")[0]
        stem = name[:name.rfind(".")]
        np.save(os.path.join(out_dir, stem + ".npy"),
                feat.cpu().numpy().astype(np.float16))
        print(f"[{i + 1}/{len(names)}] {name}: {tuple(feat.shape)}")


if __name__ == "__main__":
    main()

"""Encode text queries with CLIP for Feature3DGS querying.

Analogue of the reference viewer's inline CLIPEditor
(/root/reference/internal/renderers/feature_3dgs_renderer.py:449-466):
writes `queries.npz` with normalized text embeddings, consumed by
`gsl_tpu.training.feature3dgs.selection_score` for text-driven
extraction/deletion of gaussians.

Requires open-clip or clip + local weights:
    python tools/encode_clip_queries.py --model /models/clip-vit-b-32 \
        --out queries.npz "a chair" "the floor"
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("texts", nargs="+")
    ap.add_argument("--model", required=True, help="local CLIP model dir")
    ap.add_argument("--out", default="queries.npz")
    args = ap.parse_args()

    try:
        import torch
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer
    except ImportError as e:
        raise SystemExit(f"transformers unavailable ({e})") from e

    tokenizer = CLIPTokenizer.from_pretrained(args.model,
                                              local_files_only=True)
    model = CLIPTextModelWithProjection.from_pretrained(
        args.model, local_files_only=True).eval()
    with torch.no_grad():
        tokens = tokenizer(args.texts, padding=True, return_tensors="pt")
        emb = model(**tokens).text_embeds
        emb = emb / emb.norm(dim=-1, keepdim=True)
    np.savez(args.out, embeddings=emb.numpy().astype(np.float32),
             texts=np.array(args.texts))
    print(f"wrote {args.out}: {emb.shape}")


if __name__ == "__main__":
    main()

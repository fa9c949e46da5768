"""`python seganygs.py fit <trained_model> --data.path ...` — second-stage
SegAny feature distillation on a frozen scene.

Analogue of /root/reference/seganygs.py + internal/entrypoints/seganygs.py.
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser("seganygs")
    ap.add_argument("subcommand", choices=["fit"])
    ap.add_argument("model_path", help="trained scene (run dir or ply)")
    ap.add_argument("--data.path", dest="data_path", required=True)
    ap.add_argument("--max_steps", type=int, default=10000)
    ap.add_argument("--output", default="outputs/segany")
    ap.add_argument("--feature_dims", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsl_tpu.data.dataparsers.segany_colmap import (
        SegAnyColmapDataParserConfig)
    from gsl_tpu.data.dataset import CachedDataset
    from gsl_tpu.training.segany import SegAnyConfig, SegAnyTrainer
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader

    state, _, _ = GaussianModelLoader.load(args.model_path)
    outputs = SegAnyColmapDataParserConfig(
        path=args.data_path).instantiate().get_outputs()
    dataset = CachedDataset(outputs.train_set)

    trainer = SegAnyTrainer(
        SegAnyConfig(feature_dims=args.feature_dims), state)
    key = jax.random.PRNGKey(0)
    features, tx, opt_state = trainer.init(key)

    mask_paths = outputs.train_set.extra_data["sam_masks"]
    scale_paths = outputs.train_set.extra_data["mask_scales"]
    step_fn = None
    os.makedirs(args.output, exist_ok=True)
    n = len(dataset)
    for step in range(args.max_steps):
        i = step % n
        if mask_paths[i] is None:
            continue
        cam, name, img, _ = dataset.get(i)
        H, W = img.shape[:2]
        masks = np.load(mask_paths[i])["masks"]
        scales = (np.load(scale_paths[i])
                  if scale_paths[i] else np.ones(masks.shape[0]))
        if step_fn is None:
            step_fn = trainer.make_train_step(tx, H, W)
        key, k = jax.random.split(key)
        features, opt_state, loss = step_fn(
            features, opt_state, k, cam, jnp.asarray(masks),
            jnp.asarray(scales), jnp.asarray(1.0))
        if step % 100 == 0:
            print(f"step {step}: loss {float(loss):.4f}")
    np.save(os.path.join(args.output, "scene_features.npy"),
            np.asarray(features))
    print("saved features to", args.output)


if __name__ == "__main__":
    main()

"""`python feature3dgs.py fit <trained_model> --data.path ...` —
second-stage semantic feature-field distillation on a frozen scene.

Analogue of training the reference Feature3DGSRenderer via main.py
(/root/reference/internal/renderers/feature_3dgs_renderer.py). After
training, query per-gaussian features with CLIP text embeddings encoded
offline (gsl_tpu.training.feature3dgs.selection_score).
"""
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser("feature3dgs")
    ap.add_argument("subcommand", choices=["fit"])
    ap.add_argument("model_path", help="trained scene (run dir or ply)")
    ap.add_argument("--data.path", dest="data_path", required=True)
    ap.add_argument("--feature_dir", default="semantic/sam_features")
    ap.add_argument("--n_feature_dims", type=int, default=128)
    ap.add_argument("--speedup", action="store_true")
    ap.add_argument("--max_steps", type=int, default=10000)
    ap.add_argument("--output", default="outputs/feature3dgs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsl_tpu.data.dataparsers.feature_3dgs import (
        Feature3DGSColmapDataParserConfig)
    from gsl_tpu.data.dataset import CachedDataset
    from gsl_tpu.training.feature3dgs import (Feature3DGSConfig,
                                              Feature3DGSTrainer)
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader

    state, _, _ = GaussianModelLoader.load(args.model_path)
    outputs = Feature3DGSColmapDataParserConfig(
        path=args.data_path,
        feature_dir=args.feature_dir).instantiate().get_outputs()
    dataset = CachedDataset(outputs.train_set)
    feat_paths = outputs.train_set.extra_data["feature_map_paths"]

    cfg = Feature3DGSConfig(n_feature_dims=args.n_feature_dims,
                            speedup=args.speedup)
    trainer = Feature3DGSTrainer(cfg, state)
    params, tx, opt_state = trainer.init(jax.random.PRNGKey(0))

    os.makedirs(args.output, exist_ok=True)
    step_fn = None
    n = len(dataset)
    for step in range(1, args.max_steps + 1):
        i = (step - 1) % n
        if not os.path.isfile(feat_paths[i]):
            continue
        cam, name, img, _ = dataset.get(i)
        H, W = img.shape[:2]
        gt_map = jnp.asarray(np.load(feat_paths[i]).astype(np.float32))
        if gt_map.shape[-1] != cfg.n_feature_dims and \
                gt_map.shape[0] == cfg.n_feature_dims:
            gt_map = jnp.transpose(gt_map, (1, 2, 0))   # CHW -> HWC
        if step_fn is None:
            step_fn = trainer.make_train_step(H, W)
        params, opt_state, loss = step_fn(params, opt_state, cam, gt_map)
        if step % 100 == 0:
            print(f"step {step}: l1={float(loss):.5f}")

    np.savez(os.path.join(args.output, "features.npz"),
             **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {args.output}/features.npz")


if __name__ == "__main__":
    main()

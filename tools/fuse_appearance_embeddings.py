"""Bake per-image appearance embeddings into plain SH DC coefficients.

Analogue of /root/reference/utils/fuse_appearance_embeddings_into_shs_dc.py
(average-color fusing path, :101-163): per gaussian, rank the training
cameras by blend-weight visibility (the CUDA score kernel replaced by the
gradient identity), keep the top-K, and bake the visibility-weighted mean
of the appearance MLP's rgb offsets into shs_dc (offset / C0). The fused
model renders the scene's "average appearance" with a plain SH renderer —
no MLP at serving time.

Usage:
    python tools/fuse_appearance_embeddings.py <appearance_run_dir>
        [--n-average-cameras 32] [--max-cameras 64] [--output fused.ply]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

C0 = 0.28209479177387814


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--n-average-cameras", type=int, default=32)
    ap.add_argument("--max-cameras", type=int, default=64,
                    help="visibility-score sample size over train cameras")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsl_tpu.cli import build_components, load_config
    from gsl_tpu.training.appearance_trainer import AppearanceTrainer
    from gsl_tpu.utils.checkpoint import (find_latest_checkpoint,
                                          load_checkpoint,
                                          load_checkpoint_meta)
    from gsl_tpu.utils.ply import save_gaussian_ply

    snap = os.path.join(args.run_dir, "config.yaml")
    cfg = load_config([snap], {})
    trainer, dataparser_cfg, fit_cfg = build_components(cfg)
    assert isinstance(trainer, AppearanceTrainer), \
        "run was not trained with the appearance preset"
    outputs = dataparser_cfg.instantiate().get_outputs()

    pc = outputs.point_cloud
    capacity = max(int(pc.xyz.shape[0] * fit_cfg.capacity_multiplier),
                   fit_cfg.min_capacity)
    cap2 = 1 << 14
    while cap2 < capacity:
        cap2 <<= 1
    gaussians = trainer.model.init_from_pcd(pc.xyz, pc.rgb, cap2)
    state = trainer.setup(gaussians, outputs.camera_extent)
    ckpt = find_latest_checkpoint(os.path.join(args.run_dir, "checkpoints"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.run_dir}")
    meta = load_checkpoint_meta(ckpt)
    stored_cap = (meta or {}).get("capacity", state.params.capacity)
    if stored_cap != state.params.capacity:
        state = trainer.grow_state(state, stored_cap)
    state = load_checkpoint(ckpt, state)

    gstate = state.gaussians
    net_params = state.extra["__net__"].params
    cap = gstate.capacity
    bg = jnp.zeros(3, jnp.float32)
    sh_degree = trainer.model.sh_degree

    cams = outputs.train_set.cameras
    n_cams = min(args.max_cameras, len(outputs.train_set))
    sel = np.linspace(0, len(outputs.train_set) - 1, n_cams).astype(int)

    # --- per-(gaussian, camera) visibility scores (blend-weight identity) -
    print(f"scoring {n_cams} cameras...")
    scores = np.zeros((cap, n_cams), np.float32)

    def blend_weights(camera):
        def f(bias):
            out = trainer.renderer.forward(
                gstate, camera, int(camera.height), int(camera.width), bg,
                sh_degree,
                rgbs_override=trainer.renderer.get_rgbs(
                    gstate, camera, sh_degree) + bias[:, None])
            return jnp.sum(out.render)
        return jax.grad(f)(jnp.zeros((cap,), jnp.float32))

    for j, i in enumerate(sel):
        scores[:, j] = np.asarray(blend_weights(cams[int(i)]))

    # top-K cameras per gaussian -> normalized weights (pdf)
    k = min(args.n_average_cameras, n_cams)
    order = np.argsort(-scores, axis=1)
    keep = np.zeros_like(scores, bool)
    np.put_along_axis(keep, order[:, :k], True, axis=1)
    w = np.where(keep, scores, 0.0)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)

    # --- visibility-weighted mean rgb offset over the top-K cameras ------
    print("fusing offsets...")
    offset = np.zeros((cap, 3), np.float32)
    feats = gstate.params.appearance_features
    for j, i in enumerate(sel):
        if not np.any(w[:, j] > 0):
            continue
        cam = cams[int(i)]
        viewdirs = gstate.get_means() - cam.camera_center
        viewdirs = viewdirs / jnp.maximum(
            jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
        pred = trainer.net.apply(net_params, feats, cam.appearance_id,
                                 viewdirs)
        offset += w[:, j:j + 1] * np.asarray(pred[:, :3] * 2.0 - 1.0)

    alive = np.asarray(gstate.alive)
    p = gstate.params
    shs_dc = np.asarray(p.shs_dc).copy()
    shs_dc[:, 0, :] += offset / C0

    out = args.output or os.path.join(args.run_dir, "fused.ply")
    save_gaussian_ply(out, np.asarray(p.means)[alive],
                      np.asarray(p.scales)[alive],
                      np.asarray(p.rotations)[alive],
                      np.asarray(p.opacities)[alive],
                      shs_dc[alive], np.asarray(p.shs_rest)[alive])
    print(f"wrote {int(alive.sum())} fused gaussians to {out}")


if __name__ == "__main__":
    main()

"""Build a coarser LoD level by importance-pruning each trained partition.

Analogue of /root/reference/utils/prune_partitions_v2.py:1-188 (LightGaussian
importance prune applied per partition). Importance is the per-gaussian
accumulated blend weight over sampled assigned cameras (the repo's gradient
identity replaces the CUDA `hit_pixel_count`); `--mode opacity` is a
camera-free fallback (opacity * max_scale^0.1).

Layout convention (consumed by gsl_tpu.renderers.partition_lod):
    <partitions_dir>/partitions.npz
    <partitions_dir>/<src>/partition_%03d/...   (src "." = driver output)
    <partitions_dir>/<dst>/partition_%03d/point_cloud/iteration_1/*.ply

Usage:
    python tools/prune_partitions.py runs/parts --dst lod1 --percent 0.6
    python tools/prune_partitions.py runs/parts --src lod1 --dst lod2 \
        --percent 0.5 --mode opacity
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("partitions_dir")
    ap.add_argument("--src", default=".")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--percent", type=float, default=0.6)
    ap.add_argument("--mode", choices=["blend", "opacity"], default="blend")
    ap.add_argument("--n-cameras", type=int, default=8)
    ap.add_argument("--v-pow", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsl_tpu.training.light_gaussian import (accumulate_blend_weights,
                                                 prune_by_importance)
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    from gsl_tpu.utils.partitioning import PartitionedScene
    from gsl_tpu.utils.ply import save_gaussian_ply

    scene = PartitionedScene.load(
        os.path.join(args.partitions_dir, "partitions.npz"))

    cameras = None
    if args.mode == "blend":
        cameras = _load_cameras(args.partitions_dir, args.src, scene)
        if cameras is None:
            print("no config snapshot/dataset found; falling back to "
                  "--mode opacity")
            args.mode = "opacity"

    for pi in range(len(scene.partitions)):
        run = os.path.join(args.partitions_dir, args.src,
                           f"partition_{pi:03d}")
        if not os.path.isdir(run):
            continue
        try:
            state, renderer, sh_degree = GaussianModelLoader.load(run)
        except FileNotFoundError:
            continue

        if args.mode == "blend":
            mask = scene.partitions[pi].camera_mask
            idxs = np.nonzero(mask)[0]
            if idxs.size == 0:
                idxs = np.arange(len(cameras))
            sel = idxs[np.linspace(0, idxs.size - 1,
                                   min(args.n_cameras,
                                       idxs.size)).astype(int)]
            bg = jnp.zeros(3, jnp.float32)

            def render_fn(gs, camera, bias):
                out = renderer.forward(
                    gs, camera, int(camera.height), int(camera.width), bg,
                    sh_degree,
                    rgbs_override=renderer.get_rgbs(gs, camera, sh_degree)
                    + bias[:, None])
                return out.render

            imp = accumulate_blend_weights(
                render_fn, state, [cameras[i] for i in sel])
        else:
            imp = (jax.nn.sigmoid(state.params.opacities[:, 0])
                   * state.alive)

        pruned, _, n_pruned = prune_by_importance(
            state, None, imp, args.percent, v_pow=args.v_pow)
        alive = np.asarray(pruned.alive)
        p = pruned.params
        out_dir = os.path.join(args.partitions_dir, args.dst,
                               f"partition_{pi:03d}", "point_cloud",
                               "iteration_1")
        os.makedirs(out_dir, exist_ok=True)
        save_gaussian_ply(
            os.path.join(out_dir, "point_cloud.ply"),
            np.asarray(p.means)[alive], np.asarray(p.scales)[alive],
            np.asarray(p.rotations)[alive], np.asarray(p.opacities)[alive],
            np.asarray(p.shs_dc)[alive], np.asarray(p.shs_rest)[alive])
        print(f"partition {pi}: pruned {int(n_pruned)} -> "
              f"{int(alive.sum())} kept")


def _load_cameras(partitions_dir, src, scene):
    """Rebuild the training cameras from any partition's config snapshot."""
    from gsl_tpu.cli import build_components, load_config

    for pi in range(len(scene.partitions)):
        snap = os.path.join(partitions_dir, src, f"partition_{pi:03d}",
                            "config.yaml")
        if os.path.isfile(snap):
            try:
                cfg = load_config([snap], {})
                _, dataparser_cfg, _ = build_components(cfg)
                outputs = dataparser_cfg.instantiate().get_outputs()
                return outputs.train_set.cameras
            except Exception as e:
                print(f"snapshot {snap} unusable: {e}")
                return None
    return None


if __name__ == "__main__":
    main()

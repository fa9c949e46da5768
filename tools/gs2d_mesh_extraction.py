"""Extract a triangle mesh from a trained 2DGS (surfel) model via TSDF.

Analogue of /root/reference/utils/gs2d_mesh_extraction.py +
internal/utils/gs2d_mesh_utils.py:1-352 (bounded path; open3d replaced by
the in-repo JAX TSDF + marching tetrahedra, gsl_tpu/utils/mesh.py).

Usage:
    python tools/gs2d_mesh_extraction.py <run_dir> [--resolution 256]
        [--voxel-size auto] [--depth-trunc auto] [--alpha-thres 0.5]
        [--split train] [--median-depth]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--voxel-size", type=float, default=None)
    ap.add_argument("--sdf-trunc", type=float, default=None)
    ap.add_argument("--depth-trunc", type=float, default=None)
    ap.add_argument("--alpha-thres", type=float, default=0.5)
    ap.add_argument("--split", default="train")
    ap.add_argument("--expected-depth", action="store_true",
                    help="use expected depth instead of median depth")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gsl_tpu.cli import build_components, load_config
    from gsl_tpu.models.gaussian import GaussianState
    from gsl_tpu.renderers.surfel_renderer import SurfelRendererConfig
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    from gsl_tpu.utils.mesh import TSDFVolume, save_mesh_ply

    snap = os.path.join(args.run_dir, "config.yaml")
    cfg = load_config([snap], {})
    _, dataparser_cfg, _ = build_components(cfg)
    outputs = dataparser_cfg.instantiate().get_outputs()
    image_set = (outputs.train_set if args.split == "train"
                 else outputs.val_set)

    state, _, sh_degree = GaussianModelLoader.load(args.run_dir)
    renderer = SurfelRendererConfig().instantiate()
    bg = jnp.zeros(3, jnp.float32)

    # bounding sphere from camera centers (gs2d_mesh_utils.py:38-53)
    centers = np.stack([np.asarray(image_set.cameras[i].camera_center)
                        for i in range(len(image_set))])
    focus = centers.mean(0)
    radius = float(np.linalg.norm(centers - focus, axis=-1).max())
    depth_trunc = args.depth_trunc or 2.0 * radius
    voxel_size = args.voxel_size or (2.0 * radius / args.resolution)
    sdf_trunc = args.sdf_trunc or 5.0 * voxel_size
    print(f"radius={radius:.3f} voxel={voxel_size:.4f} "
          f"sdf_trunc={sdf_trunc:.4f} depth_trunc={depth_trunc:.3f}")

    vol = TSDFVolume(origin=focus - radius,
                     resolution=(args.resolution,) * 3,
                     voxel_size=voxel_size, sdf_trunc=sdf_trunc)
    for i in range(len(image_set)):
        cam = image_set.cameras[i]
        H, W = int(cam.height), int(cam.width)
        out = renderer.forward(state, cam, H, W, bg, sh_degree)
        depth = out.surf_depth
        K = np.asarray(cam.get_K())
        vol.integrate(depth, np.asarray(cam.world_to_camera), K,
                      alpha=out.alpha, depth_trunc=depth_trunc,
                      alpha_thres=args.alpha_thres)
        if (i + 1) % 20 == 0:
            print(f"integrated {i + 1}/{len(image_set)}")

    verts, faces = vol.extract_mesh()
    out_path = args.output or os.path.join(args.run_dir, "mesh.ply")
    save_mesh_ply(out_path, verts, faces)
    print(f"wrote {out_path}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()

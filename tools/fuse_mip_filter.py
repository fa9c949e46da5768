"""Bake the Mip-Splatting 3D filter into scales/opacities for export.

Analogue of /root/reference/utils/fuse_mip_filter.py: after fusing, the
model renders correctly in any vanilla-3DGS viewer (no filter needed).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    ap.add_argument("--dataset_path", required=True,
                    help="to recompute the 3D filter from train cameras")
    ap.add_argument("--output", "-o", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsl_tpu.data.dataparsers.colmap import ColmapDataParserConfig
    from gsl_tpu.models.gaussian import GaussianState, inverse_sigmoid
    from gsl_tpu.models.mip_splatting import (apply_3d_filter,
                                              compute_3d_filter)
    from gsl_tpu.utils.gaussian_model_loader import GaussianModelLoader
    from gsl_tpu.utils.ply import save_state_ply

    state, _, _ = GaussianModelLoader.load(args.model_path)
    outputs = ColmapDataParserConfig(
        path=args.dataset_path).instantiate().get_outputs()
    f3d = compute_3d_filter(state.params.means, state.alive,
                            outputs.train_set.cameras)
    op, scales = apply_3d_filter(
        jnp.exp(state.params.scales),
        jax.nn.sigmoid(state.params.opacities[:, 0]), f3d)
    params = state.params.replace(
        scales=jnp.log(jnp.maximum(scales, 1e-12)),
        opacities=inverse_sigmoid(
            jnp.clip(op, 1e-6, 1.0 - 1e-6))[:, None])
    fused = GaussianState(params=params, alive=state.alive)
    out = args.output or os.path.join(args.model_path, "fused.ply")
    n = save_state_ply(out, fused)
    print(f"fused {n} gaussians -> {out}")


if __name__ == "__main__":
    main()

"""CLI: `python main.py fit|validate --config configs/x.yaml --key value`.

The analogue of the reference LightningCLI surface
(/root/reference/internal/cli.py:29-156, internal/entrypoints/gspl.py:11-60):
YAML presets select component classes by path and set hyperparameters;
later configs/flags override earlier ones; `-n/--name` builds the output
dir; checkpoints auto-searched for validate.

Component selection uses `class_path`/`init_args` dicts like the reference
configs (configs/gsplat.yaml style), resolved against this package.
"""
from __future__ import annotations

import argparse
import dataclasses
import importlib
import os
from typing import Any, Dict

import yaml

from .data.dataparsers.blender import BlenderDataParserConfig
from .data.dataparsers.colmap import ColmapDataParserConfig
from .models.gaussian import VanillaGaussianConfig
from .models.mip_splatting import MipSplattingConfig
from .renderers.mip_splatting_renderer import MipSplattingRendererConfig
from .renderers.tile_renderer import TileRendererConfig
from .training.density import VanillaDensityControllerConfig
from .training.fit import FitConfig, fit, validate
from .training.mcmc import MCMCDensityControllerConfig
from .training.metrics import MCMCMetricsConfig, VanillaMetricsConfig
from .training.trainer import Trainer, TrainerConfig

_REGISTRY = {
    "VanillaGaussian": VanillaGaussianConfig,
    "MipSplatting": MipSplattingConfig,
    "TileRenderer": TileRendererConfig,
    "MipSplattingRenderer": MipSplattingRendererConfig,
    "VanillaDensityController": VanillaDensityControllerConfig,
    "MCMCDensityController": MCMCDensityControllerConfig,
    "VanillaMetrics": VanillaMetricsConfig,
    "MCMCMetrics": MCMCMetricsConfig,
    "Colmap": ColmapDataParserConfig,
    "Blender": BlenderDataParserConfig,
}


def _register_extra():
    from .data.dataparsers.estimated_depth_colmap import (
        EstimatedDepthColmapDataParserConfig)
    from .data.dataparsers.nsvf import NSVFDataParserConfig
    from .data.dataparsers.phototourism import PhotoTourismDataParserConfig
    from .data.dataparsers.matrix_city import MatrixCityDataParserConfig
    from .data.dataparsers.nerfies import NerfiesDataParserConfig
    from .data.dataparsers.segany_colmap import SegAnyColmapDataParserConfig
    from .data.dataparsers.ngp import NGPDataParserConfig
    from .models.gaussian_2d import Gaussian2DConfig
    from .models.appearance import AppearanceFeatureGaussianConfig
    from .renderers.surfel_renderer import SurfelRendererConfig
    from .training.gs2d import GS2DMetricsConfig
    from .training.depth_trainer import DepthMetricsConfig
    from .data.dataparsers.spotless_colmap import (
        SpotLessColmapDataParserConfig)
    from .training.spotless import SpotLessMetricsConfig
    from .training.density import (
        StaticDensityControllerConfig, RevisingDensityControllerConfig,
        NoCullingBigScaleDensityControllerConfig,
        H3DGSDensityControllerConfig,
        AccurateVisibilityFilterDensityControllerConfig,
        BackgroundRemovalDensityControllerConfig)
    from .training.gns import GNSDensityControllerConfig
    from .data.dataparsers.feature_3dgs import (
        Feature3DGSColmapDataParserConfig)
    from .data.dataparsers.silvr import SILVRDataParserConfig
    from .models.pvg import PVGConfig, PVGRendererConfig
    _REGISTRY.update({
        "EstimatedDepthColmap": EstimatedDepthColmapDataParserConfig,
        "NSVF": NSVFDataParserConfig,
        "PhotoTourism": PhotoTourismDataParserConfig,
        "MatrixCity": MatrixCityDataParserConfig,
        "Nerfies": NerfiesDataParserConfig,
        "SegAnyColmap": SegAnyColmapDataParserConfig,
        "NGP": NGPDataParserConfig,
        "Gaussian2D": Gaussian2DConfig,
        "AppearanceFeatureGaussian": AppearanceFeatureGaussianConfig,
        "SurfelRenderer": SurfelRendererConfig,
        "GS2DMetrics": GS2DMetricsConfig,
        "DepthMetrics": DepthMetricsConfig,
        "SpotLessColmap": SpotLessColmapDataParserConfig,
        "SpotLessMetrics": SpotLessMetricsConfig,
        "StaticDensityController": StaticDensityControllerConfig,
        "RevisingDensityController": RevisingDensityControllerConfig,
        "NoCullingBigScaleDC": NoCullingBigScaleDensityControllerConfig,
        "H3DGSDensityController": H3DGSDensityControllerConfig,
        "AccurateVisibilityFilterDensityController":
            AccurateVisibilityFilterDensityControllerConfig,
        "BackgroundRemoval": BackgroundRemovalDensityControllerConfig,
        "GNS": GNSDensityControllerConfig,
        "Feature3DGSColmap": Feature3DGSColmapDataParserConfig,
        "SILVR": SILVRDataParserConfig,
        "PVG": PVGConfig,
        "PVGRenderer": PVGRendererConfig,
    })


_register_extra()


def _resolve_class(path: str):
    if path in _REGISTRY:
        return _REGISTRY[path]
    if "." in path:
        mod, name = path.rsplit(".", 1)
        return getattr(importlib.import_module(mod), name)
    raise KeyError(f"unknown component {path!r}; known: {list(_REGISTRY)}")


def _build(cfg_cls, spec: Any):
    """Build a config dataclass from a YAML dict, supporting
    class_path/init_args subclass swaps (jsonargparse style) and nested
    dataclass fields (e.g. model.gaussian.optimization)."""
    if spec is None:
        return cfg_cls()
    if isinstance(spec, dict) and ("class_path" in spec
                                   or "init_args" in spec):
        if "class_path" in spec:
            cfg_cls = _resolve_class(spec["class_path"])
        spec = spec.get("init_args", {}) or {}
    inst = cfg_cls()
    field_names = {f.name for f in dataclasses.fields(cfg_cls)}
    for k, v in (spec or {}).items():
        if k not in field_names:
            raise KeyError(f"unknown field {k!r} for {cfg_cls.__name__}")
        cur = getattr(inst, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            setattr(inst, k, _build(type(cur), v))
        else:
            setattr(inst, k, v)
    return inst


def _deep_update(base: Dict, new: Dict) -> Dict:
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(config_paths, overrides: Dict) -> Dict:
    merged: Dict = {}
    for p in config_paths or []:
        with open(p) as f:
            _deep_update(merged, yaml.safe_load(f) or {})
    _deep_update(merged, overrides)
    return merged


def parse_overrides(pairs) -> Dict:
    out: Dict = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        val = yaml.safe_load(val)
        node = out
        parts = key.lstrip("-").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def build_components(cfg: Dict):
    data_spec = cfg.get("data", {})
    parser_spec = data_spec.get("parser", {"class_path": "Colmap"})
    if isinstance(parser_spec, str):
        parser_spec = {"class_path": parser_spec}
    if "path" in data_spec:
        parser_spec.setdefault("init_args", {})["path"] = data_spec["path"]
    dataparser_cfg = _build(ColmapDataParserConfig, parser_spec)

    model_spec = cfg.get("model", {})
    model = _build(VanillaGaussianConfig, model_spec.get("gaussian"))
    renderer = _build(TileRendererConfig, model_spec.get("renderer"))
    density = _build(VanillaDensityControllerConfig,
                     model_spec.get("density"))
    metrics = _build(VanillaMetricsConfig, model_spec.get("metric"))
    trainer_cfg = _build(TrainerConfig, cfg.get("trainer"))
    fit_cfg = _build(FitConfig, cfg.get("fit"))

    # variant trainers selected by metric/renderer type
    from .training.depth_trainer import DepthMetricsConfig, DepthTrainer
    from .training.gs2d import GS2DMetricsConfig, GS2DTrainer
    trainer_cls = Trainer
    extra_kwargs = {}
    if isinstance(metrics, GS2DMetricsConfig):
        trainer_cls = GS2DTrainer
    elif isinstance(metrics, DepthMetricsConfig):
        trainer_cls = DepthTrainer
    strat = (model_spec.get("opt_strategy")
             or cfg.get("opt_strategy"))
    if strat == "grad_acc":
        from .training.opt_strategies import GradAccConfig, GradAccTrainer
        trainer_cls = GradAccTrainer
        extra_kwargs["grad_acc"] = GradAccConfig()
    from .models.appearance import AppearanceFeatureGaussianConfig
    if isinstance(model, AppearanceFeatureGaussianConfig):
        from .training.appearance_trainer import AppearanceTrainer
        trainer_cls = AppearanceTrainer
        extra_kwargs["n_appearances"] = int(
            model_spec.get("n_appearances", 0)) or None
        # SWAG (swag_model.py): appearance + per-image transient opacity
        if model_spec.get("swag") or cfg.get("swag"):
            extra_kwargs["with_opacity"] = True
        # kNN feature-similarity regularization
        # (appearance_feature_similarity_regularization_metrics.py)
        sim_spec = model_spec.get("similarity_reg")
        if sim_spec:
            from .training.similarity_reg import SimilarityRegConfig
            extra_kwargs["similarity_reg"] = _build(
                SimilarityRegConfig,
                sim_spec if isinstance(sim_spec, dict) else {})
        # Ha-NeRF-style per-pixel visibility maps
        # (gsplat_appearance_embedding_visibility_map_renderer.py)
        vis_spec = model_spec.get("visibility_map") or cfg.get(
            "visibility_map")
        if vis_spec:
            from .training.visibility_map_trainer import (
                VisibilityMapAppearanceTrainer)
            trainer_cls = VisibilityMapAppearanceTrainer
            if isinstance(vis_spec, dict):
                # e.g. {grid_type: hash} selects the multi-res hash
                # encoding (tcnn HashGrid analogue) over dense 2D grids
                if "grid_type" in vis_spec:
                    extra_kwargs["grid_type"] = vis_spec["grid_type"]
    # output processors: shorthand names or class_path
    # (reference configs/bilagrid*.yaml -> internal/output_processors/)
    op_spec = model_spec.get("output_processor") or cfg.get(
        "output_processor")
    if op_spec:
        from .training.output_processors import (BilateralGridConfig,
                                                 ExposureConfig)
        if isinstance(op_spec, str):
            op_spec = {"class_path": op_spec}
        shorthand = {"bilagrid": BilateralGridConfig,
                     "exposure": ExposureConfig}
        cls_name = op_spec.get("class_path", "bilagrid")
        if cls_name in shorthand:
            extra_kwargs["output_processor"] = _build(
                shorthand[cls_name], op_spec.get("init_args", {}))
        else:
            extra_kwargs["output_processor"] = _build(
                BilateralGridConfig, op_spec)  # class_path resolved inside

    # glossy gaussians: env light + metalness (models/glossy.py)
    if model_spec.get("glossy") or cfg.get("glossy"):
        from .training.glossy_trainer import GlossyTrainer
        trainer_cls = GlossyTrainer

    # dynamic scenes: deformable / 4DGS hexplane field
    deform_spec = model_spec.get("deform") or cfg.get("deform")
    if deform_spec:
        from .models.deform import DeformModelConfig
        from .training.deform_trainer import DeformTrainer
        if isinstance(deform_spec, str):
            deform_spec = {"field": deform_spec}
        trainer_cls = DeformTrainer
        extra_kwargs["field"] = deform_spec.get("field", "mlp")
        extra_kwargs["deform_cfg"] = _build(
            DeformModelConfig, deform_spec.get("init_args", {}))

    # plugins (reference internal/plugins/): list of names or class_path
    plugin_specs = cfg.get("plugins") or model_spec.get("plugins") or []
    if plugin_specs:
        from .training.plugins import PLUGIN_REGISTRY
        plugins = []
        for spec in plugin_specs:
            if isinstance(spec, str):
                spec = {"class_path": spec}
            name = spec.get("class_path")
            pcfg_cls = PLUGIN_REGISTRY.get(name) or _resolve_class(name)
            plugins.append(_build(pcfg_cls, spec.get("init_args", {})
                                  ).instantiate())
        extra_kwargs["plugins"] = tuple(plugins)

    extra_kwargs = {k: v for k, v in extra_kwargs.items() if v is not None}
    trainer = trainer_cls(model=model, renderer=renderer, density=density,
                          metrics=metrics, config=trainer_cfg,
                          **extra_kwargs)
    return trainer, dataparser_cfg, fit_cfg


def main(argv=None):
    ap = argparse.ArgumentParser("gsl_tpu")
    ap.add_argument("subcommand", choices=["fit", "validate", "test"])
    ap.add_argument("--config", action="append", default=[])
    ap.add_argument("--data.path", dest="data_path", default=None)
    ap.add_argument("-n", "--name", default="run")
    ap.add_argument("--output", default="outputs")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--viewer", action="store_true",
                    help="serve the in-training web viewer (reference "
                         "--viewer)")
    ap.add_argument("--viewer_port", type=int, default=8080)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("set", nargs="*", help="key=value overrides")
    args = ap.parse_args(argv)

    overrides = parse_overrides(args.set)
    config_paths = list(args.config)
    if args.subcommand in ("validate", "test"):
        # resume from the run's own config snapshot so model/capacity
        # templates match the checkpoint (reference auto ckpt search +
        # hparams-from-ckpt, internal/cli.py:92-110)
        snap = os.path.join(args.output, args.name, "config.yaml")
        if os.path.exists(snap):
            config_paths = [snap] + config_paths
    cfg = load_config(config_paths, overrides)
    if args.data_path:
        cfg.setdefault("data", {})["path"] = args.data_path
    if args.max_steps:
        cfg.setdefault("fit", {})["max_steps"] = args.max_steps
        cfg.setdefault("trainer", {})["max_steps"] = args.max_steps
    cfg.setdefault("fit", {}).setdefault(
        "output_dir", os.path.join(args.output, args.name))
    if args.viewer:
        cfg["fit"]["viewer"] = True
        cfg["fit"]["viewer_port"] = args.viewer_port
    cfg["fit"]["seed"] = args.seed

    trainer, dataparser_cfg, fit_cfg = build_components(cfg)
    outputs = dataparser_cfg.instantiate().get_outputs()

    if args.subcommand == "fit":
        # snapshot the resolved config into the run dir
        # (reference save_config_kwargs, internal/entrypoints/gspl.py:36)
        os.makedirs(fit_cfg.output_dir, exist_ok=True)
        with open(os.path.join(fit_cfg.output_dir, "config.yaml"),
                  "w") as f:
            yaml.safe_dump(cfg, f)
        dist_spec = cfg.get("distributed")
        if dist_spec:
            # `distributed: true` (or a {dp, mp, compact_k, backend} dict)
            # routes to the mesh training loop — the reference's
            # `main.py fit --config configs/distributed.yaml` MPStrategy
            # surface (internal/mp_strategy.py:29-129)
            from .parallel.fit_distributed import fit_distributed
            from .parallel.gaussian_sharded import make_mesh
            dist = dist_spec if isinstance(dist_spec, dict) else {}
            mesh = make_mesh(dist.get("n_devices"), dp=dist.get("dp"),
                             mp=dist.get("mp"))
            state, results = fit_distributed(
                trainer, outputs, fit_cfg, mesh=mesh,
                compact_k=dist.get("compact_k", "auto"),
                backend=dist.get("backend", "auto"))
        else:
            state, results = fit(trainer, outputs, fit_cfg)
        if results:
            print(f"val: psnr={results['psnr']:.3f} "
                  f"ssim={results['ssim']:.4f}")
    else:
        from .utils.checkpoint import (find_latest_checkpoint,
                                       load_checkpoint, load_checkpoint_meta)
        pc = outputs.point_cloud
        capacity = max(int(pc.xyz.shape[0] * fit_cfg.capacity_multiplier),
                       fit_cfg.min_capacity)
        gaussians = trainer.model.init_from_pcd(pc.xyz, pc.rgb,
                                                _round_cap(capacity))
        state = trainer.setup(gaussians, outputs.camera_extent)
        ckpt = find_latest_checkpoint(
            os.path.join(fit_cfg.output_dir, "checkpoints"))
        if ckpt is None:
            raise FileNotFoundError("no checkpoint found")
        # grown runs store their final capacity in fit_meta.json; the
        # restore target must match those shapes
        meta = load_checkpoint_meta(ckpt)
        stored_cap = (meta or {}).get("capacity", state.params.capacity)
        if stored_cap != state.params.capacity:
            state = trainer.grow_state(state, stored_cap)
        state = load_checkpoint(ckpt, state)
        split = "val" if args.subcommand == "validate" else "test"
        results = validate(trainer, state, outputs, fit_cfg, split=split,
                           save_images=True)
        print(f"{split}: psnr={results['psnr']:.3f} "
              f"ssim={results['ssim']:.4f}")


def _round_cap(n):
    cap = 1 << 14
    while cap < n:
        cap <<= 1
    return cap


if __name__ == "__main__":
    main()

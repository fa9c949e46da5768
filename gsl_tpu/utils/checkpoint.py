"""Checkpoint save/load (orbax) for the TrainState.

Parity with the reference checkpoint semantics
(/root/reference/internal/gaussian_splatting.py:199-221,682-723): full state
including optimizer moments + density stats; loads re-shape by stored
capacity (the padded-state analogue of `setup_from_number`); optional
`drop_optimizer_states` for finetune-style loads.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _pack_zero_size(tree):
    """Orbax cannot store zero-size arrays (e.g. shs_rest at sh_degree 0);
    swap them for 1-element placeholders (restored via the target)."""
    def f(x):
        if hasattr(x, "size") and x.size == 0:
            return np.zeros((1,), x.dtype)
        return x
    return jax.tree.map(f, tree)


def _unpack_zero_size(restored, target):
    def f(r, t):
        if hasattr(t, "size") and t.size == 0:
            return t
        return r
    return jax.tree.map(f, restored, target)


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None,
                    meta: Optional[dict] = None):
    """`meta` (JSON-serializable) is written next to the tree so resume can
    rebuild the target shapes (capacity) and loop context (rng,
    isect_capacity) before restoring — the analogue of the reference's
    hyperparameter snapshot inside the Lightning ckpt
    (gaussian_splatting.py:66 save_hyperparameters)."""
    import json

    import orbax.checkpoint as ocp

    step = int(step if step is not None else state.step)
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _pack_zero_size(jax.device_get(state)), force=True)
    if meta is not None:
        with open(os.path.join(path, "fit_meta.json"), "w") as f:
            json.dump(dict(meta, step=step), f)
    return path


def load_checkpoint_meta(path: str) -> Optional[dict]:
    import json

    meta_path = os.path.join(path, "fit_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Max-iteration auto-search (reference gaussian_model_loader.py:10-60)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                s = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if s > best_step:
                best, best_step = os.path.join(ckpt_dir, name), s
    return best


def load_checkpoint(path: str, target,
                    drop_optimizer_states: bool = False):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path),
                                 item=_pack_zero_size(target))
    restored = _unpack_zero_size(restored, target)
    if drop_optimizer_states and hasattr(restored, "opt_state") \
            and hasattr(target, "opt_state"):
        restored = restored.replace(opt_state=target.opt_state)
    return restored

"""Checkpoint/resume for the FULL training pytree.

Unlike the reference — whose capture() misses the curve-specific tensors, so
checkpoint/resume of curve state is effectively broken
(gaussian_model.py:74-106, see SURVEY §3.5) — we serialize the complete
TrainState (params, Adam moments, topology, densify stats, step) to a
single .npz.  Leaves are stored under their PYTREE PATH NAMES (e.g.
``params/curve_points``, ``opt/mu/width_raw``) plus explicit
``capacity``/``step``/``schema_version`` metadata, so a checkpoint is
self-describing and robust to TrainState growing new fields.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.train import TrainState

SCHEMA_VERSION = 2
_META = "__schema_version"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _named_leaves(ts: TrainState):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(ts)
    return {(_path_str(path)): leaf for path, leaf in leaves}, treedef


def save_checkpoint(path: str, ts: TrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    named, _ = _named_leaves(ts)
    np.savez(
        path,
        **{k: np.asarray(v) for k, v in named.items()},
        **{
            _META: SCHEMA_VERSION,
            "__capacity": ts.alive.shape[0],
            "__step": int(ts.step),
        },
    )


def _check_schema(data, path: str):
    if _META not in data.files:
        raise ValueError(
            f"{path}: not a v{SCHEMA_VERSION} checkpoint (missing "
            f"'{_META}'). Pre-round-2 'leaf_<i>' checkpoints are no longer "
            "readable; re-save from a live TrainState."
        )
    v = int(data[_META])
    if v != SCHEMA_VERSION:
        raise ValueError(
            f"{path}: checkpoint schema v{v}, this build reads v{SCHEMA_VERSION}"
        )


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same capacity/shapes)."""
    data = np.load(path)
    _check_schema(data, path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in flat:
        name = _path_str(p)
        if name not in data.files:
            raise ValueError(
                f"{path}: checkpoint missing leaf '{name}' — saved by an "
                "older TrainState layout"
            )
        arr = data[name]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"{path}: leaf '{name}' has shape {arr.shape}, template "
                f"{leaf.shape} — capacity mismatch; rebuild the template at "
                "the saved capacity"
            )
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_capacity(path: str) -> Tuple[int, int]:
    """(capacity, step) read from checkpoint metadata (no template needed)."""
    data = np.load(path)
    _check_schema(data, path)
    return int(data["__capacity"]), int(data["__step"])

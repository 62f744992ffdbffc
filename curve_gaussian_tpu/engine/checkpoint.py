"""Checkpoint/resume for the FULL training pytree.

Unlike the reference — whose capture() misses the curve-specific tensors, so
checkpoint/resume of curve state is effectively broken
(gaussian_model.py:74-106, see SURVEY §3.5) — we serialize the complete
TrainState (params, Adam moments, topology, densify stats, step) to a
single .npz, complete by construction.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.train import TrainState


def _flatten(ts: TrainState):
    leaves, treedef = jax.tree_util.tree_flatten(ts)
    return leaves, treedef


def save_checkpoint(path: str, ts: TrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, _ = _flatten(ts)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        n_leaves=len(leaves),
    )


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same capacity/shapes)."""
    data = np.load(path)
    leaves, treedef = _flatten(template)
    n = int(data["n_leaves"])
    assert n == len(leaves), f"checkpoint has {n} leaves, template {len(leaves)}"
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        assert arr.shape == leaf.shape, (
            f"leaf {i}: checkpoint {arr.shape} vs template {leaf.shape} — "
            "capacity mismatch; rebuild the template at the saved capacity"
        )
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_capacity(path: str) -> Tuple[int, int]:
    """(capacity, step) peeked from a checkpoint without a template."""
    data = np.load(path)
    # leaf 0 is params['curve_points'] in dict order; robust approach: find a
    # [C,4,3] array and a scalar int32 step
    cap = None
    step = 0
    for k in data.files:
        if k == "n_leaves":
            continue
        a = data[k]
        if a.ndim == 3 and a.shape[1:] == (4, 3) and cap is None:
            cap = a.shape[0]
        if a.ndim == 0 and a.dtype in (np.int32, np.int64):
            step = max(step, int(a))
    return cap or 0, step

"""CurveState — the model, as a pure pytree of fixed-capacity arrays.

Functional re-design of the reference's stateful GaussianCurveModel
(scene/gaussian_curve_model.py).  Learnable leaves:

  curve_points [C,4,3]   Bézier control points / line endpoints (rows 0,3)
  opacity_raw  [C]       inverse-sigmoid of per-CURVE opacity
  width_raw    [C]       log of perpendicular Gaussian width
  mask_raw     [C,M]     per-Gaussian pruning-mask logits
  features_dc  [C,M,1]   SH degree-0 color features (kept for parity; the
                         renderer forces colors to ones, so these carry no
                         gradient — same as the reference where
                         colors_precomp=ones makes feature grads zero)
  exposure     [V,2]     per-view scalar affine (scale, offset); the
                         reference's [3,4] affine would crash on its own
                         1-channel output, see ops/render.py

Topology leaves (not optimized):
  is_bezier [C] bool, alive [C] bool.

XLA needs static shapes, so the curve count lives in a fixed CAPACITY C with
an `alive` mask; topology surgery (models/surgery.py) runs host-side at
coarse cadence and re-buckets the capacity in powers of two, bounding
recompilations to O(log C) over a whole run.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bezier
from ..ops.knn import mean_knn_sq_dist

INIT_OPACITY = 0.6  # gaussian_curve_model.py:153-154
INIT_WIDTH = 5e-3  # :155-156
INIT_HALF_LEN = 0.5  # init_size (:143)
MIN_CAPACITY = 256


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def inverse_sigmoid_np(x):
    return np.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CurveState:
    curve_points: jnp.ndarray
    opacity_raw: jnp.ndarray
    width_raw: jnp.ndarray
    mask_raw: jnp.ndarray
    features_dc: jnp.ndarray
    exposure: jnp.ndarray
    is_bezier: jnp.ndarray
    alive: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.curve_points.shape[0]

    @property
    def n_gaussians(self) -> int:
        return self.mask_raw.shape[1]

    def n_alive(self) -> int:
        return int(jnp.sum(self.alive))


TRAINABLE_FIELDS = (
    "curve_points",
    "opacity_raw",
    "width_raw",
    "mask_raw",
    "features_dc",
    "exposure",
)


def trainable(state: CurveState) -> Dict[str, jnp.ndarray]:
    return {k: getattr(state, k) for k in TRAINABLE_FIELDS}


def with_trainable(state: CurveState, t: Dict[str, jnp.ndarray]) -> CurveState:
    return dataclasses.replace(state, **t)


def round_capacity(n: int) -> int:
    c = MIN_CAPACITY
    while c < n:
        c *= 2
    return c


def init_state(
    points: np.ndarray,
    n_views: int,
    n_gaussians: int = 12,
    capacity: int | None = None,
    dtype=jnp.float32,
) -> CurveState:
    """Seed one Bézier per point; half-length = 0.5 * sqrt(mean 3-NN sq dist)
    (gaussian_curve_model.py:142-178)."""
    pts = jnp.asarray(points, dtype)
    n = pts.shape[0]
    d2 = jnp.maximum(mean_knn_sq_dist(pts, k=3), 1e-7)
    bound = INIT_HALF_LEN * jnp.sqrt(d2)
    cp = bezier.initialize_bezier_curves(pts, bound)
    cap = capacity or round_capacity(n)
    m = n_gaussians

    def padc(x, fill=0.0):
        pad = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    return CurveState(
        curve_points=padc(cp),
        opacity_raw=padc(jnp.full((n,), inverse_sigmoid(INIT_OPACITY), dtype)),
        width_raw=padc(jnp.full((n,), float(np.log(INIT_WIDTH)), dtype)),
        mask_raw=padc(jnp.ones((n, m), dtype)),
        features_dc=padc(jnp.zeros((n, m, 1), dtype)),
        exposure=jnp.tile(jnp.asarray([1.0, 0.0], dtype), (max(n_views, 1), 1)),
        is_bezier=padc(jnp.ones((n,), bool), fill=False),
        alive=padc(jnp.ones((n,), bool), fill=False),
    )


def curve_opacity(state: CurveState) -> jnp.ndarray:
    return jax.nn.sigmoid(state.opacity_raw)


def curve_width(state: CurveState) -> jnp.ndarray:
    return jnp.exp(state.width_raw)


def mask_sigmoid(state: CurveState) -> jnp.ndarray:
    return jax.nn.sigmoid(state.mask_raw)


def gaussians(
    state: CurveState,
    use_mask: bool = False,
    mask_threshold: float = 0.01,
):
    """Derive flattened per-Gaussian attributes (the reference's
    prepare_scaling_rot + render-time mask gating).

    Returns dict(xyz [C*M,3], scale [C*M,3], quat [C*M,4], opacity [C*M],
    alive [C*M] bool, tangent [C*M,3]).  With use_mask, the straight-through
    hard mask gates both scales and opacity
    (gaussian_renderer/__init__.py:72-76).
    """
    m = state.n_gaussians
    g = bezier.curve_gaussians(
        state.curve_points, curve_width(state), state.is_bezier, m
    )
    opa = jnp.broadcast_to(curve_opacity(state)[:, None], (state.capacity, m))
    scale = g["scale"]
    if use_mask:
        s = jax.nn.sigmoid(state.mask_raw)
        hard = (s > mask_threshold).astype(s.dtype)
        st = s + jax.lax.stop_gradient(hard - s)
        scale = scale * st[..., None]
        opa = opa * st
    alive_g = jnp.broadcast_to(state.alive[:, None], (state.capacity, m))
    return {
        "xyz": g["xyz"].reshape(-1, 3),
        "scale": scale.reshape(-1, 3),
        "quat": g["quat"].reshape(-1, 4),
        "opacity": opa.reshape(-1),
        "alive": alive_g.reshape(-1),
        "tangent": g["tangent"].reshape(-1, 3),
    }

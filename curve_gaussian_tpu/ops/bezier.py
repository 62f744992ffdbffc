"""Cubic Bézier / line-segment geometry core (pure jnp, differentiable).

This is the heart of the bi-directional curve<->Gaussian coupling: curves are
sampled into chains of elongated Gaussians every iteration, so pixel-loss
gradients flow back through these functions into the control points.

Semantics re-derived from the reference implementation
(scene/gaussian_curve_model.py:27-51, 70-89, 180-198, 366-421):
  * every curve is stored as 4 control points [*, 4, 3]; straight segments
    use only rows 0 and 3 (selected by an `is_bezier` bool)
  * M Gaussians per curve at midpoints t_j = (j + 0.5) / M
  * Gaussian long-axis scale s0 = || B(t_j) - B(t_j - 0.5/M) || (arc spacing)
  * perpendicular scales s1 = s2 = curve width
  * rotation frame: first axis = normalized tangent.  Because s1 == s2 the
    Gaussian covariance R diag(s0,s1,s1)^2 R^T = s0^2 v0 v0^T + s1^2 (I - v0 v0^T)
    depends ONLY on the tangent direction, so any orthonormal completion of
    the frame is exactly equivalent.  (The reference normalizes its v1/v2 by a
    *global* norm — gaussian_curve_model.py:189-192 — which is immaterial for
    rendering for the same reason; we build a per-row orthonormal frame.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .quaternion import rotmat_to_quat


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False, eps: float = 1e-12):
    """L2 norm with a finite gradient at 0 (returns 0 there).

    jnp.linalg.norm's gradient at exactly zero is 0/0 = NaN; capacity-padded
    (dead) curves hit that constantly, so every norm on possibly-degenerate
    geometry must go through here.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    pos = sq > eps
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-12):
    """x/|x| with zero output (and finite gradient) for zero input."""
    n = safe_norm(x, axis=axis, keepdims=True, eps=eps)
    return x / jnp.where(n > 0, n, 1.0)

# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def bezier_point(cp: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate cubic Béziers.

    cp: [..., 4, 3] control points; t: [T] parameters.
    Returns [..., T, 3].
    """
    t = t[..., :, None]  # [T,1]
    p0, p1, p2, p3 = (cp[..., i, None, :] for i in range(4))
    u = 1.0 - t
    return u**3 * p0 + 3.0 * u**2 * t * p1 + 3.0 * u * t**2 * p2 + t**3 * p3


def bezier_tangent(cp: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Derivative of cubic Béziers; [..., 4, 3], [T] -> [..., T, 3]."""
    t = t[..., :, None]
    p0, p1, p2, p3 = (cp[..., i, None, :] for i in range(4))
    u = 1.0 - t
    return 3.0 * u**2 * (p1 - p0) + 6.0 * u * t * (p2 - p1) + 3.0 * t**2 * (p3 - p2)


def line_point(cp: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation between control rows 0 and 3."""
    t = t[..., :, None]
    p0, p3 = cp[..., 0, None, :], cp[..., 3, None, :]
    return (1.0 - t) * p0 + t * p3


def line_tangent(cp: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    d = (cp[..., 3, None, :] - cp[..., 0, None, :])
    return jnp.broadcast_to(d, d.shape[:-2] + (t.shape[-1], 3))


def curve_point(cp: jnp.ndarray, t: jnp.ndarray, is_bezier: jnp.ndarray) -> jnp.ndarray:
    """Mixed Bézier/line evaluation. is_bezier: [...] bool. -> [..., T, 3]."""
    return jnp.where(is_bezier[..., None, None], bezier_point(cp, t), line_point(cp, t))


def curve_tangent(cp: jnp.ndarray, t: jnp.ndarray, is_bezier: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        is_bezier[..., None, None], bezier_tangent(cp, t), line_tangent(cp, t)
    )


# ---------------------------------------------------------------------------
# Curve -> Gaussian sampling (the reference's prepare_scaling_rot)
# ---------------------------------------------------------------------------


def sample_t_midpoints(n_gaussians: int, dtype=jnp.float32) -> jnp.ndarray:
    """t_j = (j + 0.5)/M, j = 0..M-1 (gaussian_curve_model.py:58)."""
    m = n_gaussians
    return (jnp.arange(m, dtype=dtype) + 0.5) / m


def tangent_frame(tangent: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Orthonormal frame with first COLUMN aligned to the tangent.

    tangent: [..., 3] (not necessarily unit).  Returns [..., 3, 3] rotation
    whose columns are (v0, v1, v2), v0 = tangent direction.  Degenerate
    tangents (parallel to the primary up vector) fall back to a secondary up.
    """
    v0 = safe_normalize(tangent)
    up1 = jnp.array([0.0, 0.0, 1.0], dtype=tangent.dtype)
    up2 = jnp.array([0.0, 1.0, 0.0], dtype=tangent.dtype)
    a1 = jnp.cross(v0, jnp.broadcast_to(up1, v0.shape))
    a2 = jnp.cross(v0, jnp.broadcast_to(up2, v0.shape))
    n1 = safe_norm(a1, keepdims=True)
    use2 = n1 < 1e-4
    a = jnp.where(use2, a2, a1)
    v1 = safe_normalize(a)
    v2 = jnp.cross(v0, v1)
    return jnp.stack([v0, v1, v2], axis=-1)


def _elevate_lines(cp: jnp.ndarray, is_bezier: jnp.ndarray) -> jnp.ndarray:
    """Replace line rows by their EXACT cubic representation (degree
    elevation: p1 = p0 + (p3-p0)/3, p2 = p0 + 2(p3-p0)/3), so one Bézier
    basis evaluates both primitive kinds.  Line storage only defines rows
    0 and 3 (rows 1-2 may hold stale data) — elevation ignores them, same
    as the reference's line_point (gaussian_curve_model.py:70-78)."""
    p0, p3 = cp[:, 0], cp[:, 3]
    d = (p3 - p0) / 3.0
    cp_lin = jnp.stack([p0, p0 + d, p0 + 2.0 * d, p3], axis=1)
    return jnp.where(is_bezier[:, None, None], cp, cp_lin)


@functools.lru_cache(maxsize=None)
def _bases(m: int):
    """(position, half-step-back position, tangent) bases, each [3M, 12]
    with the component identity kroneckered in, as numpy constants."""
    t = (np.arange(m, dtype=np.float64) + 0.5) / m

    def pos(tv):
        u = 1.0 - tv
        return np.stack([u**3, 3 * u**2 * tv, 3 * u * tv**2, tv**3], axis=-1)

    def tan(tv):
        u = 1.0 - tv
        return np.stack(
            [-3 * u**2, 3 * u**2 - 6 * u * tv, 6 * u * tv - 3 * tv**2, 3 * tv**2],
            axis=-1,
        )

    eye = np.eye(3)
    return tuple(
        np.kron(b, eye).astype(np.float32)
        for b in (pos(t), pos(t - 0.5 / m), tan(t))
    )


def curve_gaussians(
    cp: jnp.ndarray,
    width: jnp.ndarray,
    is_bezier: jnp.ndarray,
    n_gaussians: int,
    eps: float = 1e-8,
):
    """Derive per-Gaussian (xyz, quaternion, scale) from curve parameters.

    cp:       [N, 4, 3] control points
    width:    [N] activated width (> 0)
    is_bezier:[N] bool
    Returns dict with
      xyz   [N, M, 3]   Gaussian centers at t = (j+0.5)/M
      quat  [N, M, 4]   unit quaternion, first axis = tangent
      scale [N, M, 3]   (arc spacing, width, width)
      tangent [N, M, 3] unnormalized curve tangent at sample t
    Mirrors gaussian_curve_model.py:180-198.

    TPU layout note: [N, M, 3] tensors pad their tiny trailing dims onto
    (8, 128) vector tiles (~40x lane waste), which made the naive
    formulation the single most expensive stage of a training step
    (~4.9 ms).  This path therefore works in TRANSPOSED component form —
    curve evaluation as one [3M, 12] @ [12, N] basis matmul per quantity
    (N dense on lanes, MXU) and all frame math on [M, N] component arrays
    — and transposes to the conventional layout only at the output.

    Frame note: because s1 == s2, the covariance R diag(s0,s1,s1)^2 R^T
    depends only on the tangent axis (module docstring), so the quaternion
    here is the MINIMAL rotation taking e_x to the tangent — cheaper than
    the reference's cross-product frame + pytorch3d rotmat->quat chain and
    exactly equivalent for rendering (first axis identical)."""
    N = cp.shape[0]
    m = n_gaussians
    Bp, Bb, Bt = (jnp.asarray(b) for b in _bases(m))
    cpT = _elevate_lines(cp, is_bezier).transpose(1, 2, 0).reshape(12, N)
    hp = jax.lax.Precision.HIGHEST
    xyz3 = jnp.matmul(Bp, cpT, precision=hp).reshape(m, 3, N)
    back3 = jnp.matmul(Bb, cpT, precision=hp).reshape(m, 3, N)
    tan3 = jnp.matmul(Bt, cpT, precision=hp).reshape(m, 3, N)

    d = xyz3 - back3
    s0 = safe_norm(d, axis=1)  # [M, N]

    tn = safe_norm(tan3, axis=1)  # [M, N]
    tnz = jnp.where(tn > 0, tn, 1.0)
    v0x, v0y, v0z = tan3[:, 0] / tnz, tan3[:, 1] / tnz, tan3[:, 2] / tnz
    # minimal rotation e_x -> v0: q ~ (1 + v0x, 0, -v0z, v0y); the v0x ~ -1
    # pole falls back to a half-turn about y (also maps e_x -> -e_x)
    w = 1.0 + v0x
    qn_sq = w * w + v0z * v0z + v0y * v0y
    ok = qn_sq > eps
    qn = jnp.where(ok, jnp.sqrt(jnp.where(ok, qn_sq, 1.0)), 1.0)
    qw = jnp.where(ok, w / qn, 0.0)
    qy = jnp.where(ok, -v0z / qn, 1.0)
    qz = jnp.where(ok, v0y / qn, 0.0)
    qx = jnp.zeros_like(qw)

    xyz = xyz3.transpose(2, 0, 1)  # [N, M, 3]
    tangent = tan3.transpose(2, 0, 1)
    quat = jnp.stack([qw, qx, qy, qz], axis=-1).transpose(1, 0, 2)  # [N, M, 4]
    s12 = jnp.broadcast_to(width[:, None], (N, m))
    scale = jnp.stack([s0.T, s12, s12], axis=-1)  # [N, M, 3]
    return {"xyz": xyz, "quat": quat, "scale": scale, "tangent": tangent}


# ---------------------------------------------------------------------------
# De Casteljau split / trim (topology surgery primitives)
# ---------------------------------------------------------------------------


def de_casteljau_split(cp: jnp.ndarray, t: jnp.ndarray, is_bezier: jnp.ndarray):
    """Split curves at parameter t.

    cp: [N, 4, 3]; t: [N] (or [N,1]); is_bezier: [N] bool.
    Returns (left [N,4,3], right [N,4,3]).  Straight segments split linearly
    with interior control points placed at thirds so the 4-point storage stays
    consistent (gaussian_curve_model.py:388-421).
    """
    t = jnp.reshape(t, (-1, 1))
    c0, c1, c2, c3 = cp[:, 0], cp[:, 1], cp[:, 2], cp[:, 3]
    q0 = (1 - t) * c0 + t * c1
    q1 = (1 - t) * c1 + t * c2
    q2 = (1 - t) * c2 + t * c3
    r0 = (1 - t) * q0 + t * q1
    r1 = (1 - t) * q1 + t * q2
    s = (1 - t) * r0 + t * r1
    left_b = jnp.stack([c0, q0, r0, s], axis=1)
    right_b = jnp.stack([s, r1, q2, c3], axis=1)

    sl = (1 - t) * c0 + t * c3
    left_l = jnp.stack(
        [c0, (2 / 3) * c0 + (1 / 3) * sl, (1 / 3) * c0 + (2 / 3) * sl, sl], axis=1
    )
    right_l = jnp.stack(
        [sl, (2 / 3) * sl + (1 / 3) * c3, (1 / 3) * sl + (2 / 3) * c3, c3], axis=1
    )
    sel = is_bezier[:, None, None]
    return jnp.where(sel, left_b, left_l), jnp.where(sel, right_b, right_l)


def de_casteljau_trim(
    cp: jnp.ndarray, from_t: jnp.ndarray, end_t: jnp.ndarray, is_bezier: jnp.ndarray
) -> jnp.ndarray:
    """Keep the [from_t, end_t] portion of each curve.

    Matches gaussian_curve_model.py:366-369: split at from_t, keep right,
    split the right part at the ORIGINAL end_t (which, applied to the right
    part, lands at a slightly different arclength — reference semantics kept).
    """
    from_t = jnp.clip(jnp.reshape(from_t, (-1,)), 0.0, 1.0)
    end_t = jnp.clip(jnp.reshape(end_t, (-1,)), 0.0, 1.0)
    _, right = de_casteljau_split(cp, from_t, is_bezier)
    left, _ = de_casteljau_split(right, end_t, is_bezier)
    return left


def curve_lengths(
    cp: jnp.ndarray, is_bezier: jnp.ndarray, n_samples: int = 64
) -> jnp.ndarray:
    """Polyline arclength approximation, [N,4,3] -> [N]."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=cp.dtype)
    pts = curve_point(cp, t, is_bezier)
    return jnp.linalg.norm(jnp.diff(pts, axis=-2), axis=-1).sum(axis=-1)


def initialize_bezier_curves(points: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Seed one Y-axis-aligned Bézier per point (gaussian_curve_model.py:27-51).

    points: [N,3] seed centers; bound: [N] half-length.
    Control points at center ± {1, 0.5} * bound along +Y.
    """
    direction = jnp.stack(
        [jnp.zeros_like(bound), bound, jnp.zeros_like(bound)], axis=-1
    )
    return jnp.stack(
        [
            points - direction,
            points - 0.5 * direction,
            points + 0.5 * direction,
            points + direction,
        ],
        axis=1,
    )

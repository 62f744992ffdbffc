"""Host-side curve/line fitting primitives (numpy).

Own implementations of what the reference pulls from skimage/sklearn/scipy
(edge_extraction/fitting.py, merging.py):

  * fit_line_pca      — PCA line fit returning clamped segment + frame
  * fit_bezier_lsq    — cubic Bézier fit by CLOSED-FORM linear least squares
                        (the Bézier is linear in its control points for fixed
                        t, so scipy.curve_fit's iterative solve is
                        unnecessary; uniform t like the reference)
  * ransac_line       — 2-point RANSAC line consensus (skimage LineModelND
                        equivalent, deterministic seeded)
  * pairwise segment distance / direction-cosine matrices (vectorized)
  * merge_endpoints   — connected-component endpoint snapping
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components

BEZIER_W = np.array(
    [[-1, 3, -3, 1], [3, -6, 3, 0], [-3, 3, 0, 0], [1, 0, 0, 0]], dtype=np.float64
)


def bezier_design_matrix(t: np.ndarray) -> np.ndarray:
    """[n] -> [n, 4] basis: rows (t^3, t^2, t, 1) @ W."""
    T = np.stack([t**3, t**2, t, np.ones_like(t)], axis=1)
    return T @ BEZIER_W


def sample_bezier(cp: np.ndarray, t: np.ndarray) -> np.ndarray:
    """cp [4,3] (or [N,4,3]), t [n] -> points [n,3] (or [N,n,3])."""
    A = bezier_design_matrix(t)
    return A @ cp


def fit_line_pca(points: np.ndarray):
    """PCA line fit (edge_extraction/fitting.py:74-97).

    Returns (start, end, direction, mean_point, t_min, t_max)."""
    mean = points.mean(axis=0)
    centered = points - mean
    cov = centered.T @ centered / len(points)
    w, v = np.linalg.eigh(cov)
    direction = v[:, np.argmax(w)]
    direction = direction / (np.linalg.norm(direction) + 1e-12)
    proj = centered @ direction
    t_min, t_max = proj.min(), proj.max()
    return (
        mean + t_min * direction,
        mean + t_max * direction,
        direction,
        mean,
        t_min,
        t_max,
    )


def fit_bezier_lsq(
    points: np.ndarray, error_threshold: float = 0.02
) -> Optional[np.ndarray]:
    """Least-squares cubic Bézier through ordered points; None if RMSE exceeds
    threshold (fitting.py:52-71 semantics with an exact linear solve)."""
    n = len(points)
    if n < 4:
        return None
    t = np.linspace(0.0, 1.0, n)
    A = bezier_design_matrix(t)  # [n, 4]
    cp, *_ = np.linalg.lstsq(A, points, rcond=None)
    resid = points - A @ cp
    rmse = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))
    if rmse > error_threshold:
        return None
    return cp.astype(np.float32)


def ransac_line(
    points: np.ndarray,
    residual_threshold: float,
    max_trials: int = 200,
    seed: int = 0,
) -> np.ndarray:
    """Inlier mask of the best 2-point consensus line."""
    n = len(points)
    if n < 2:
        return np.ones(n, bool)
    rng = np.random.default_rng(seed)
    # vectorized trials: sample endpoints pairs
    i = rng.integers(0, n, size=max_trials)
    j = rng.integers(0, n, size=max_trials)
    same = i == j
    j = np.where(same, (j + 1) % n, j)
    p0 = points[i]  # [T,3]
    d = points[j] - p0
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    # distance of all points to each line: || (x-p0) - ((x-p0).d) d ||
    rel = points[None, :, :] - p0[:, None, :]  # [T,n,3]
    along = np.einsum("tnc,tc->tn", rel, d)
    perp = rel - along[..., None] * d[:, None, :]
    dist = np.linalg.norm(perp, axis=-1)  # [T,n]
    inliers = dist < residual_threshold
    best = np.argmax(inliers.sum(axis=1))
    return inliers[best]


def segment_point_distances(segments: np.ndarray, points: np.ndarray) -> np.ndarray:
    """segments [N,6], points [M,3] -> [N,M] min distances (merging.py:63-81)."""
    p1 = segments[:, :3][:, None, :]
    p2 = segments[:, 3:][:, None, :]
    delta = p2 - p1
    denom = np.sum(delta * delta, axis=-1)
    denom = np.where(denom < 1e-18, 1.0, denom)
    u = np.clip(np.sum((points[None] - p1) * delta, axis=-1) / denom, 0.0, 1.0)
    closest = p1 + u[..., None] * delta
    return np.linalg.norm(closest - points[None], axis=-1)


def pairwise_segment_distances(segments: np.ndarray) -> np.ndarray:
    """Symmetric [N,N] of min(seg_i to endpoints of seg_j) (merging.py:84-106)."""
    endpoints = segments.reshape(-1, 3)
    d = segment_point_distances(segments, endpoints)  # [N, 2N]
    n = len(segments)
    d = d.reshape(n, n, 2).min(axis=-1)
    out = np.triu(d, 1)
    return out + out.T


def pairwise_cosine_similarity(segments: np.ndarray) -> np.ndarray:
    dirs = segments[:, 3:] - segments[:, :3]
    norm = np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-12
    dirs = dirs / norm
    return dirs @ dirs.T


def merge_endpoints(
    line_segments: np.ndarray,
    bezier_curves: np.ndarray,
    distance_threshold: float = 0.015,
) -> Tuple[np.ndarray, np.ndarray]:
    """Snap all endpoints within threshold to their component mean
    (merging.py:10-56).  line_segments [L,6], bezier_curves [B,12]."""
    n_lines = len(line_segments)
    n_curves = len(bezier_curves)
    if n_lines == 0 and n_curves == 0:
        return line_segments, bezier_curves
    parts = []
    if n_lines:
        parts.append(np.asarray(line_segments).reshape(-1, 3))
    if n_curves:
        parts.append(
            np.asarray(bezier_curves)[:, [0, 1, 2, -3, -2, -1]].reshape(-1, 3)
        )
    pts = np.concatenate(parts, axis=0)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    adj = csr_matrix(d <= distance_threshold)
    ncomp, labels = connected_components(adj)
    for c in range(ncomp):
        idx = np.where(labels == c)[0]
        if len(idx) > 1:
            pts[idx] = pts[idx].mean(axis=0)
    lines_out = line_segments
    curves_out = bezier_curves
    if n_lines:
        lines_out = pts[: n_lines * 2].reshape(-1, 6)
    if n_curves:
        ce = pts[n_lines * 2 :].reshape(-1, 6)
        curves_out = np.array(bezier_curves, copy=True)
        curves_out[:, :3] = ce[:, :3]
        curves_out[:, 9:] = ce[:, 3:]
    return lines_out, curves_out

"""Curve-reconstruction metrics (reference edge_extraction/eval_utils.py +
eval_ABC.py), on scipy cKDTree instead of point_cloud_utils.

Chamfer/accuracy/completeness, precision/recall/F-score/IOU at 5/10/20 mm,
tangent-direction cosine similarity, and the 256^3 voxel-average downsample
applied to predictions before matching (eval_utils.py:500-538).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..native import nn1

DEFAULT_THRESHOLDS = (0.005, 0.01, 0.02)


def downsample_voxel_average(
    points: np.ndarray,
    num_voxels_per_axis: int = 256,
    min_bound=None,
    max_bound=None,
) -> np.ndarray:
    """Average the points inside each occupied voxel (pcu
    downsample_point_cloud_on_voxel_grid equivalent)."""
    if len(points) == 0:
        return points
    mn = np.asarray(min_bound if min_bound is not None else points.min(0), float)
    mx = np.asarray(max_bound if max_bound is not None else points.max(0), float)
    size = (mx - mn) / num_voxels_per_axis
    size = np.where(size <= 0, 1.0, size)
    ids = np.floor((points - mn) / size).astype(np.int64)
    ids = np.clip(ids, 0, num_voxels_per_axis - 1)
    key = (ids[:, 0] * num_voxels_per_axis + ids[:, 1]) * num_voxels_per_axis + ids[
        :, 2
    ]
    order = np.argsort(key)
    key_s = key[order]
    pts_s = points[order]
    boundaries = np.flatnonzero(np.diff(key_s)) + 1
    groups = np.split(pts_s, boundaries)
    return np.stack([g.mean(axis=0) for g in groups]).astype(points.dtype)


def chamfer(pred: np.ndarray, gt: np.ndarray):
    """Returns (chamfer, accuracy, completeness): acc = mean pred->gt dist,
    comp = mean gt->pred dist (eval_utils.py:77-130)."""
    if len(pred) == 0 or len(gt) == 0:
        return float("inf"), float("inf"), float("inf")
    d_pred_to_gt, _ = nn1(gt, pred)
    d_gt_to_pred, _ = nn1(pred, gt)
    acc = float(np.mean(d_pred_to_gt))
    comp = float(np.mean(d_gt_to_pred))
    return acc + comp, acc, comp


def precision_recall_iou(
    pred: np.ndarray,
    gt: np.ndarray,
    thresholds=DEFAULT_THRESHOLDS,
) -> Dict[str, float]:
    """eval_utils.py:195-233 semantics."""
    out: Dict[str, float] = {}
    if len(pred) == 0 or len(gt) == 0:
        for t in thresholds:
            out[f"precision_{t}"] = 0.0
            out[f"recall_{t}"] = 0.0
            out[f"fscore_{t}"] = 0.0
            out[f"IOU_{t}"] = 0.0
        return out
    d_pred, _ = nn1(gt, pred)
    d_gt, _ = nn1(pred, gt)
    for t in thresholds:
        correct_pred = int(np.sum(d_pred < t))
        correct_gt = int(np.sum(d_gt < t))
        precision = correct_pred / len(d_pred)
        recall = correct_gt / len(d_gt)
        f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        inter = min(correct_pred, correct_gt)
        union = len(d_pred) + len(d_gt) - max(correct_pred, correct_gt)
        out[f"precision_{t}"] = precision
        out[f"recall_{t}"] = recall
        out[f"fscore_{t}"] = f
        out[f"IOU_{t}"] = inter / union if union else 0.0
    return out


def direction_similarity(
    pred_points: np.ndarray,
    pred_dirs: np.ndarray,
    gt_points: np.ndarray,
    gt_dirs: np.ndarray,
) -> float:
    """Mean |cos| between each predicted tangent and its nearest GT tangent
    (eval_ABC.py:27-38)."""
    if len(pred_points) == 0 or len(gt_points) == 0:
        return 0.0
    _, idx = nn1(gt_points, pred_points)
    g = gt_dirs[idx]
    num = np.abs(np.sum(pred_dirs * g, axis=1))
    den = np.linalg.norm(pred_dirs, axis=1) * np.linalg.norm(g, axis=1) + 1e-12
    return float(np.mean(num / den))


def evaluate_edges(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    pred_dirs: Optional[np.ndarray] = None,
    gt_dirs: Optional[np.ndarray] = None,
    thresholds=DEFAULT_THRESHOLDS,
    voxel_downsample: bool = True,
) -> Dict[str, float]:
    """Full metric sweep on unit-cube scenes (eval_ABC.process_scan)."""
    pred_ds = (
        downsample_voxel_average(
            pred_points, 256, min_bound=(0, 0, 0), max_bound=(1, 1, 1)
        )
        if voxel_downsample and len(pred_points)
        else pred_points
    )
    ch, acc, comp = chamfer(pred_ds, gt_points)
    out = {"chamfer": ch, "accuracy": acc, "completeness": comp}
    out.update(precision_recall_iou(pred_ds, gt_points, thresholds))
    if pred_dirs is not None and gt_dirs is not None and len(pred_points):
        out["direction_sim"] = direction_similarity(
            pred_points, pred_dirs, gt_points, gt_dirs
        )
    return out

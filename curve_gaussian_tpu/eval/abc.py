"""ABC-NEF evaluation harness (reference edge_extraction/eval_ABC.py +
eval_utils.get_gt_points), numpy-only.

GT sharp edges come from the ABC CAD data: per-scan .obj vertices + the
chunk_0000_feats.json curve annotations (BSpline/Circle/Ellipse -> 'curve',
Line -> 'line'); vertex chains are resampled at 5 mm and renormalized into
the unit cube with the scan's bbox from chunk_0000_stats.json
(eval_utils.py:251-366).  Predictions come from parametric_edges.json.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .extract import sample_edge_dict
from .metrics import evaluate_edges

CURVE_TYPE_RENAME = {
    "BSpline": "curve",
    "Circle": "curve",
    "Ellipse": "curve",
    "Line": "line",
}


def load_obj_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            t = line.split()
            if t and t[0] == "v":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
    return np.asarray(verts, np.float64)


def get_gt_points(
    scan_name: str,
    data_base_dir: str,
    edge_type: str = "all",
    interval: float = 0.005,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(points [N,3], directions [N,3]) of GT sharp edges in the unit cube."""
    objs_dir = os.path.join(data_base_dir, "obj")
    obj_names = sorted(os.listdir(objs_dir))
    index = {n[:8]: n for n in obj_names}
    with open(os.path.join(data_base_dir, "chunk_0000_feats.json")) as f:
        feats = json.load(f)
    with open(os.path.join(data_base_dir, "chunk_0000_stats.json")) as f:
        stats = json.load(f)
    bbox = stats[scan_name]["bbox"]
    x_min, y_min, z_min, x_max, y_max, z_max, xr, yr, zr = bbox
    scale = 1.0 / max(xr, yr, zr)
    center = np.array(
        [(x_min + x_max) / 2, (y_min + y_max) / 2, (z_min + z_max) / 2]
    ) * scale
    offset = np.array([0.5, 0.5, 0.5]) - center

    verts = load_obj_vertices(os.path.join(objs_dir, index[scan_name]))
    pts_out, dir_out = [], []
    for curve in feats[scan_name]:
        if edge_type != "all" and CURVE_TYPE_RENAME[curve["type"]] != edge_type:
            continue
        if not curve["sharp"]:
            continue
        chain = verts[np.asarray(curve["vert_indices"], int)]
        for a, b in zip(chain[:-1], chain[1:]):
            seg = np.linalg.norm(b - a)
            num = int(seg // interval)
            if num <= 0:
                continue
            # reference samples linspace*current + (1-linspace)*next
            t = np.linspace(0.0, 1.0, num)
            pts_out.append(t[:, None] * a + (1 - t)[:, None] * b)
            d = (b - a) / seg
            dir_out.append(np.tile(d, (num, 1)))
    if not pts_out:
        return None
    pts = np.concatenate(pts_out) * scale + offset
    dirs = np.concatenate(dir_out)
    return pts.astype(np.float32), dirs.astype(np.float32)


def evaluate_scan(
    pred_json_path: str,
    scan_name: str,
    data_base_dir: str,
    thresholds=(0.005, 0.01, 0.02),
) -> Dict[str, float]:
    """Full metric sweep for one scan (eval_ABC.process_scan semantics),
    including per-type (curve/line) accuracy/completeness."""
    with open(pred_json_path) as f:
        edge_dict = json.load(f)
    pred_pts, pred_dirs = sample_edge_dict(edge_dict, with_directions=True)
    gt = get_gt_points(scan_name, data_base_dir)
    if gt is None:
        return {}
    gt_pts, gt_dirs = gt
    out = evaluate_edges(pred_pts, gt_pts, pred_dirs, gt_dirs, thresholds)
    out["n_curves"] = len(edge_dict.get("curves_ctl_pts", []))
    out["n_lines"] = len(edge_dict.get("lines_end_pts", []))
    # per-type completeness/accuracy (eval_ABC.py:225-240)
    for etype in ("curve", "line"):
        gt_t = get_gt_points(scan_name, data_base_dir, edge_type=etype)
        if gt_t is None:
            continue
        res_t = evaluate_edges(pred_pts, gt_t[0], thresholds=thresholds)
        out[f"acc_{etype}"] = res_t["accuracy"]
        out[f"comp_{etype}"] = res_t["completeness"]
    return out


def scatter_diagnostic(pred_pts: np.ndarray, gt_pts: np.ndarray,
                       out_png: str, title: str = "") -> None:
    """Quick per-scan pred-vs-GT side-by-side scatter (the reference's
    edge_extraction/eval_utils.py:17-62 matplotlib diagnostic).  Three
    orthographic projections, GT left / prediction right, one PNG —
    meant for eyeballing a batch run, not for metrics (the splatted
    novel-view render in scripts/render_curves.py is the high-fidelity
    visual)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 2, figsize=(7, 10))
    planes = [("x", "y", 0, 1), ("x", "z", 0, 2), ("y", "z", 1, 2)]
    for row, (nx, ny, i, j) in enumerate(planes):
        for col, (pts, name, color) in enumerate(
            ((gt_pts, "GT", "tab:blue"), (pred_pts, "pred", "tab:red"))
        ):
            ax = axes[row][col]
            ax.scatter(pts[:, i], pts[:, j], s=0.3, c=color, linewidths=0)
            ax.set_aspect("equal")
            ax.set_xlabel(nx)
            ax.set_ylabel(ny)
            if row == 0:
                ax.set_title(f"{name} {title}")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def evaluate_batch(
    output_dir: str,
    scan_names: List[str],
    data_base_dir: str,
    log_path: Optional[str] = None,
) -> Dict[str, float]:
    """Aggregate metrics over scans; each scan's prediction is expected at
    <output_dir>/<scan>/parametric_edges.json (eval_ABC.main)."""
    per_scan = {}
    for scan in scan_names:
        p = os.path.join(output_dir, scan, "parametric_edges.json")
        if not os.path.exists(p):
            continue
        per_scan[scan] = evaluate_scan(p, scan, data_base_dir)
        try:  # per-scan side-by-side diagnostic next to the prediction
            with open(p) as f:
                edge_dict = json.load(f)
            pred_pts, _ = sample_edge_dict(edge_dict)
            gt = get_gt_points(scan, data_base_dir)
            if gt is not None:
                scatter_diagnostic(
                    np.asarray(pred_pts), np.asarray(gt[0]),
                    os.path.join(output_dir, scan, "pred_vs_gt.png"),
                    title=scan,
                )
        except Exception as e:  # diagnostics never fail the eval
            print(f"scatter diagnostic failed for {scan}: {e}")
    agg: Dict[str, float] = {}
    if per_scan:
        keys = set().union(*(set(v) for v in per_scan.values()))
        for k in keys:
            vals = np.array([v[k] for v in per_scan.values() if k in v], float)
            vals[np.isnan(vals)] = 0
            agg[k] = round(float(vals.mean()), 4)
    if log_path:
        with open(log_path, "w") as f:
            json.dump({"mean": agg, "per_scan": per_scan}, f, indent=1)
    return agg

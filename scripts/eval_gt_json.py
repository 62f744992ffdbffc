#!/usr/bin/env python
"""Evaluate a parametric_edges.json against a ground-truth edge JSON.

Both files use the extraction format ({curves_ctl_pts, lines_end_pts});
metrics are the ABC harness ones (Chamfer/P/R/F1/IOU @5/10/20mm, direction
similarity — eval/metrics.py).  Used for fabricated scenes that ship a
gt_edges.json (scripts/make_ref_scale_scene.py).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from curve_gaussian_tpu.eval import metrics as M
    from curve_gaussian_tpu.eval.extract import sample_edge_dict

    pred = json.load(open(args.pred))
    gt = json.load(open(args.gt))
    pred_pts, pred_dirs = sample_edge_dict(pred, with_directions=True)
    gt_pts, gt_dirs = sample_edge_dict(gt, with_directions=True)
    res = M.evaluate_edges(pred_pts, gt_pts, pred_dirs, gt_dirs)
    res["n_pred_curves"] = len(pred.get("curves_ctl_pts", []))
    res["n_pred_lines"] = len(pred.get("lines_end_pts", []))
    for k, v in res.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

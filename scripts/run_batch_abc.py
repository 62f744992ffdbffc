#!/usr/bin/env python
"""Batch driver: train every ABC scan under a data root, then evaluate.

Reference scripts/run_batch_ABC.py semantics: one subprocess per scan,
skipping scans whose parametric_edges.json already exists (that file IS the
recovery story — re-running the batch resumes where it stopped).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="dir of per-scan scenes")
    p.add_argument("--output-root", default="output_ABC")
    p.add_argument("--resolution", "-r", type=int, default=2)
    p.add_argument("--detector", default="DexiNed")
    p.add_argument("--gt-base-dir", default=None,
                   help="ABC GT dir (obj/ + chunk_0000_*.json) for eval")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra args forwarded to train.py")
    args = p.parse_args()

    scans = sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d))
    )
    print(f"{len(scans)} scans")
    for scan in scans:
        out_dir = os.path.join(args.output_root, scan)
        done = os.path.join(out_dir, "parametric_edges.json")
        if os.path.exists(done):
            print(f"skip {scan} (already done)")
            continue
        cmd = [
            sys.executable, "train.py",
            "-s", os.path.join(args.data_root, scan),
            "-m", out_dir,
            "-r", str(args.resolution),
            "--detector", args.detector,
        ] + args.extra
        print(" ".join(cmd), flush=True)
        ret = subprocess.call(cmd)
        if ret != 0:
            print(f"scan {scan} failed with {ret}", file=sys.stderr)

    if args.gt_base_dir:
        from curve_gaussian_tpu.eval.abc import evaluate_batch

        agg = evaluate_batch(
            args.output_root, scans, args.gt_base_dir,
            log_path=os.path.join(args.output_root, "eval_summary.json"),
        )
        for k in sorted(agg):
            print(f"{k}: {agg[k]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Batch driver: train every ABC scan under a data root, then evaluate.

Reference scripts/run_batch_ABC.py semantics: one subprocess per scan,
skipping scans whose parametric_edges.json already exists (that file IS the
recovery story — re-running the batch resumes where it stopped).

--in-process runs all scans in THIS process instead: on the tunneled TPU
runtime that amortizes the ~150 s backend init per scan AND keeps the
in-memory jit caches live, so scans 2..N of a same-shape sweep pay zero
compiles (the persistent cache covers cross-process, this covers
cross-scan).  A scan failure is caught and the batch continues, matching
the subprocess isolation semantics as closely as one process can.
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
    p.add_argument("--in-process", action="store_true",
                   help="train scans in this process (amortize TPU init + "
                        "keep jit caches live across same-shape scans)")
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
        argv = [
            "-s", os.path.join(args.data_root, scan),
            "-m", out_dir,
            "-r", str(args.resolution),
            "--detector", args.detector,
        ] + args.extra
        if args.in_process:
            print(f"[in-process] train.py {' '.join(argv)}", flush=True)
            import train as train_cli

            old_argv = sys.argv
            try:
                sys.argv = ["train.py"] + argv
                train_cli.main()
            except Exception as e:  # keep the batch going, like subprocess
                print(f"scan {scan} failed: {e!r}", file=sys.stderr)
            finally:
                sys.argv = old_argv
            continue
        cmd = [sys.executable, "train.py"] + argv
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

#!/usr/bin/env python
"""Summarize a training run from its metrics.jsonl.

Prints iteration throughput, loss trajectory checkpoints, overflow totals,
and test metrics — the quick post-run health check for RESULTS entries.
"""
import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    args = p.parse_args()
    path = os.path.join(args.model_path, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    train = [r for r in rows if "total" in r]
    tests = [r for r in rows if "test_l1" in r]
    if not train:
        print("no training rows", file=sys.stderr)
        return
    iters = [r["iter"] for r in train]
    it_times = [r["iter_time"] for r in train if "iter_time" in r]
    overflow = sum(int(r.get("overflow", 0)) for r in train)
    print(f"iterations logged: {len(train)} (last {max(iters)})")
    if it_times:
        mean_t = sum(it_times) / len(it_times)
        print(f"mean iter_time {mean_t*1e3:.1f} ms -> {1.0/mean_t:.1f} it/s")
        tail = it_times[len(it_times) // 2 :]
        print(
            f"second-half mean {sum(tail)/len(tail)*1e3:.1f} ms "
            f"-> {len(tail)/sum(tail):.1f} it/s"
        )
    print(f"overflow candidates dropped (total): {overflow}")
    for frac in (0, 0.25, 0.5, 0.75, 1.0):
        r = train[min(int(frac * (len(train) - 1)), len(train) - 1)]
        print(f"  iter {r['iter']:>6}: loss {r['total']:.4f}")
    for r in tests:
        print(
            f"test @ {r['iter']}: L1 {r['test_l1']:.5f} "
            f"PSNR {r['test_psnr']:.2f}"
        )


if __name__ == "__main__":
    main()

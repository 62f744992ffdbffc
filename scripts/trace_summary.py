#!/usr/bin/env python
"""Summarize a jax.profiler trace: per-op device time totals.

Usage: python scripts/trace_summary.py <trace_dir> [top_n]

Parses the .xplane.pb under <trace_dir>/plugins/profile/*/ and prints the
TPU device-lane ops ranked by total duration, with occurrence counts —
the table that drives the per-step cost model in ROADMAP.md.  Durations
are summed over every occurrence in the trace window; divide by the
number of steps captured to get per-step cost.
"""
import collections
import glob
import os
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_xspace(trace_dir):
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb"),
        os.path.join(trace_dir, "**", "*.xplane.pb"),
    ]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            xs = xplane_pb2.XSpace()
            with open(hits[-1], "rb") as f:
                xs.ParseFromString(f.read())
            return xs, hits[-1]
    raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")


def summarize(xs, device_only=True, line_filter="XLA Ops"):
    """{op name: (total_us, count)} over matching lines of matching planes.

    Defaults to the synchronous 'XLA Ops' lane — 'Async XLA Ops' durations
    span start->done (they include waiting, not compute) and double-count
    against the sync lane.
    """
    out = collections.defaultdict(lambda: [0.0, 0])
    plane_names = []
    for plane in xs.planes:
        if device_only and "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        plane_names.append(plane.name)
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line_filter and line.name != line_filter:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur_us = ev.duration_ps / 1e6
                out[name][0] += dur_us
                out[name][1] += 1
    return out, plane_names


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs, path = load_xspace(trace_dir)
    print(f"# {path}")
    ops, planes = summarize(xs)
    if not ops:
        ops, planes = summarize(xs, device_only=False, line_filter=None)
    print(f"# planes: {planes}")
    total = sum(v[0] for v in ops.values())
    print(f"# total device-op time: {total/1e3:.3f} ms (summed over lanes)")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    print(f"{'us_total':>12} {'count':>8} {'us_each':>10}  op")
    for name, (us, n) in rows[:top_n]:
        print(f"{us:12.1f} {n:8d} {us/max(n,1):10.2f}  {name}")


if __name__ == "__main__":
    main()

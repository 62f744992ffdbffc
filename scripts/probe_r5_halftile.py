#!/usr/bin/env python
"""Sizing analysis for the 16x32 half-tile lane-packing lever (ROADMAP:
"16x32 thin-splat tile packing").

Idea: split each 32x32 tile into top/bottom 16x32 halves with independent
depth-ordered instance lists; one (8,128) register still holds the full
32x32 tile (halves = sublanes 0-3 / 4-7), and each blend iteration
processes TWO instances (one per half) with per-sublane-half field
selects.  Per 32x32 tile the loop then runs max(n_top, n_bot) iterations
instead of n_tile ~ n_top + n_bot - dup, halving iteration count when few
splats straddle the 16-px boundary — at the cost of +dup pair volume in
the sort/gather stages.

This probe computes the EXACT iteration/pair ratios on the bench-point
geometry (CPU, no TPU needed) by monkeypatching binning.TILE_H to 16 and
re-running the real candidacy test.  GO if iteration ratio <~ 0.62 and
pair growth <~ 1.25 (then kernel wins ~ (1-r)*(fwd 1.07 + bwd 2.2 ms)
minus ~ (growth-1)*(sort 0.49 + gather 0.41 + emission 0.18) ms).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops.projection import preprocess

H = W = 512
cams = synthetic.ring_cameras(4, H, W)
seed_pts = synthetic.grid_seed_points(15)
state = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
gs = cs.gaussians(state)


def tile_counts(pre, tile_h):
    """Per-tile raw candidate counts at the given tile height (counts
    un-clamped: K large)."""
    old = B.TILE_H
    B.TILE_H = tile_h
    try:
        nty = -(-H // tile_h)
        ntx = -(-W // B.TILE_W)
        b = B._bin_sort(pre, nty, ntx, 8192, 16, 4, 4096, packed=False)
        return np.asarray(b.counts).reshape(nty, ntx)
    finally:
        B.TILE_H = old


for vi, cam in enumerate(cams[:2]):
    pre = preprocess(
        gs["xyz"], gs["scale"], gs["quat"], gs["opacity"], cam,
        alive=gs["alive"],
    )
    c32 = tile_counts(pre, 32)  # [16, 16]
    c16 = tile_counts(pre, 16)  # [32, 16]
    top, bot = c16[0::2], c16[1::2]  # halves of each 32x32 tile
    pairs32, pairs16 = c32.sum(), c16.sum()
    # iterations, current paired-x scheme: sum over x-pairs of max
    it_now = np.maximum(c32[:, 0::2], c32[:, 1::2]).sum()
    # half-split scheme (no x-pairing): per tile max(top, bot)
    it_half = np.maximum(top, bot).sum()
    # half-split + x-pairing: per x-pair max over the 4 halves
    m = np.maximum(top, bot)
    it_half_x = np.maximum(m[:, 0::2], m[:, 1::2]).sum()
    ey = np.asarray(pre.extent[:, 1])[np.asarray(pre.valid)]
    print(
        f"view {vi}: pairs32 {pairs32} pairs16 {pairs16} "
        f"(growth {pairs16/pairs32:.3f})  iters: now {it_now} "
        f"half {it_half} ({it_half/it_now:.3f}x) "
        f"half+x {it_half_x} ({it_half_x/it_now:.3f}x)  "
        f"extent_y px: median {np.median(ey):.1f} p90 "
        f"{np.percentile(ey, 90):.1f}",
        flush=True,
    )

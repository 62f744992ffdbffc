"""Tile binning: per-tile depth-ordered Gaussian lists with static shapes.

TPU-first replacement for the reference's duplicate-keys + radix-sort +
identifyTileRanges pipeline (cuda_rasterizer/rasterizer_impl.cu:70-138,
283-320).  XLA wants static shapes, so instead of variable-length per-tile
ranges we build a dense [num_tiles, K] index table:

  1. sort Gaussians once by view depth ([P] sort — cheap);
  2. for each tile, candidacy = AABB/tile interval overlap, evaluated as a
     dense [tiles, P] boolean in depth order (vectorized VPU work);
  3. compact each tile row to its first K candidates with a row-wise
     cumsum + batched searchsorted (k-th candidate = first index where the
     prefix count reaches k+1) — deterministic, no atomics, no scatter.

Tiles whose candidate count exceeds K keep the K NEAREST Gaussians (depth
order) and drop the farthest — the principled overflow policy since far
splats are the most occluded.  Overflow is reported so callers can log it.

Tile geometry is chosen for the VPU: TILE_H x TILE_W = 8 x 128 matches one
(8,128) float32 vector register exactly, so the blend kernel wastes no lanes
(the reference's 16x16 CUDA tile would pad to (16,128) on TPU and waste 8x).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Preprocessed

TILE_H = 8
TILE_W = 128


def tile_grid(height: int, width: int):
    nty = -(-height // TILE_H)
    ntx = -(-width // TILE_W)
    return nty, ntx


class Binning(NamedTuple):
    gather_idx: jnp.ndarray  # [T, K] int32 Gaussian index (depth order per tile)
    slot_valid: jnp.ndarray  # [T, K] bool
    counts: jnp.ndarray  # [T] int32 (clamped to K)
    overflow: jnp.ndarray  # [] int32 — total candidates dropped by capacity K


@functools.partial(
    jax.jit, static_argnames=("height", "width", "capacity", "row_group")
)
def bin_gaussians(
    pre: Preprocessed,
    height: int,
    width: int,
    capacity: int = 1024,
    row_group: int = 8,
) -> Binning:
    """Build the per-tile Gaussian table.

    row_group: tile rows are processed in groups under lax.map to bound the
    [tiles, P] mask memory (peak = row_group * ntx * P int32).
    """
    nty, ntx = tile_grid(height, width)
    P = pre.mean2d.shape[0]

    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
    mx = pre.mean2d[order, 0]
    my = pre.mean2d[order, 1]
    ex = pre.extent[order, 0]
    ey = pre.extent[order, 1]
    valid = pre.valid[order]

    xmin, xmax = mx - ex, mx + ex
    ymin, ymax = my - ey, my + ey

    # tile x-interval overlap per tile column: [ntx, P]
    tx0 = (jnp.arange(ntx, dtype=mx.dtype) * TILE_W)[:, None]
    x_overlap = (xmin[None, :] <= tx0 + (TILE_W - 1)) & (xmax[None, :] >= tx0)

    n_groups = -(-nty // row_group)
    pad_rows = n_groups * row_group

    def process_group(g):
        rows = g * row_group + jnp.arange(row_group)
        ty0 = (rows.astype(mx.dtype) * TILE_H)[:, None]
        row_in_range = (rows < nty)[:, None]
        y_overlap = (
            (ymin[None, :] <= ty0 + (TILE_H - 1))
            & (ymax[None, :] >= ty0)
            & row_in_range
        )
        # mask [row_group, ntx, P]
        mask = (
            y_overlap[:, None, :] & x_overlap[None, :, :] & valid[None, None, :]
        ).reshape(row_group * ntx, P)
        prefix = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        total = prefix[:, -1]
        k = jnp.arange(1, capacity + 1, dtype=jnp.int32)
        slot_idx = jax.vmap(lambda a: jnp.searchsorted(a, k, side="left"))(prefix)
        slot_ok = k[None, :] <= total[:, None]
        slot_idx = jnp.where(slot_ok, slot_idx, 0)
        gidx = order[slot_idx].astype(jnp.int32)
        counts = jnp.minimum(total, capacity)
        over = jnp.maximum(total - capacity, 0).sum()
        return gidx, slot_ok, counts, over

    gidx, slot_ok, counts, over = jax.lax.map(process_group, jnp.arange(n_groups))
    T = nty * ntx
    gidx = gidx.reshape(pad_rows * ntx, capacity)[:T]
    slot_ok = slot_ok.reshape(pad_rows * ntx, capacity)[:T]
    counts = counts.reshape(pad_rows * ntx)[:T]
    return Binning(
        gather_idx=gidx,
        slot_valid=slot_ok,
        counts=counts.astype(jnp.int32),
        overflow=over.sum().astype(jnp.int32),
    )

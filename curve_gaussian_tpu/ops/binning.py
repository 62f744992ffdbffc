"""Tile binning: per-tile depth-ordered Gaussian lists with static shapes.

TPU-first replacement for the reference's duplicate-keys + radix-sort +
identifyTileRanges pipeline (cuda_rasterizer/rasterizer_impl.cu:70-138,
283-320).  XLA wants static shapes, so instead of variable-length per-tile
ranges we build a dense [num_tiles, K] index table:

  1. sort Gaussians once by view depth ([P] sort — cheap);
  2. candidacy of (tile, gaussian) = AABB/tile interval overlap AND a
     conservative max-alpha bound: a tile whose closest point to the mean
     has 0.5*lambda_min(conic)*d^2 beyond ln(255*opacity) cannot contain
     any pixel passing the alpha >= 1/255 cutoff, so culling it is exact;
  3. per-tile slot of each candidate = its depth-rank within the tile, read
     from a dense [tiles, P] prefix-count (one cumsum — cheap VPU work);
  4. each Gaussian emits its (<= max_rect) rect tiles as [P, R] pairs that
     SCATTER their sorted index into the [tiles, K] table at their slot.

Earlier designs compacted each tile row with searchsorted / nonzero over
the dense mask; on v5e those lower to per-element loops (~50-120 ms at
256x49k).  The pair formulation touches only sum(rect areas) ~ a few
hundred thousand elements (gather + scatter), measured ~20x faster.

Capacity bounds (both REPORTED via `overflow`, never silent):
  * per-tile capacity K keeps the K nearest (depth order) — far splats are
    the most occluded;
  * per-Gaussian rect clipped to max_rect tiles (row-major from the rect's
    top-left); only pathological splats (> max_rect tiles after the alpha
    cull) lose tiles.

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
from .rasterize_ref import ALPHA_EPS

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
    overflow: jnp.ndarray  # [] int32 — candidates dropped by K or max_rect


@functools.partial(
    jax.jit, static_argnames=("height", "width", "capacity", "max_rect")
)
def bin_gaussians(
    pre: Preprocessed,
    height: int,
    width: int,
    capacity: int = 1024,
    max_rect: int = 16,
) -> Binning:
    nty, ntx = tile_grid(height, width)
    T = nty * ntx
    P = pre.mean2d.shape[0]
    K = capacity
    fdt = pre.mean2d.dtype

    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
    # one packed gather for all per-gaussian fields (measured ~3x cheaper
    # than seven separate gathers by `order`)
    packed = jnp.concatenate(
        [
            pre.mean2d,
            pre.extent,
            pre.conic,
            pre.opacity[:, None],
            pre.valid[:, None].astype(pre.mean2d.dtype),
        ],
        axis=1,
    )[order]
    mx, my = packed[:, 0], packed[:, 1]
    ex, ey = packed[:, 2], packed[:, 3]
    conic = packed[:, 4:7]
    opa = packed[:, 7]
    valid = packed[:, 8] > 0.5

    # conservative alpha-bound radius (see module docstring)
    half_tr = 0.5 * (conic[:, 0] + conic[:, 2])
    lmin = half_tr - jnp.sqrt(
        jnp.maximum(
            (0.5 * (conic[:, 0] - conic[:, 2])) ** 2 + conic[:, 1] ** 2, 0.0
        )
    )
    lmin = jnp.maximum(lmin, 1e-12)
    log_ratio = jnp.log(jnp.maximum(opa, 1e-12) / ALPHA_EPS)
    r_eff2 = jnp.where(log_ratio > 0, 2.0 * log_ratio / lmin, -1.0)

    # clipped tile rect per gaussian
    x0t = jnp.clip(jnp.floor((mx - ex) / TILE_W).astype(jnp.int32), 0, ntx)
    x1t = jnp.clip(jnp.floor((mx + ex) / TILE_W).astype(jnp.int32) + 1, 0, ntx)
    y0t = jnp.clip(jnp.floor((my - ey) / TILE_H).astype(jnp.int32), 0, nty)
    y1t = jnp.clip(jnp.floor((my + ey) / TILE_H).astype(jnp.int32) + 1, 0, nty)
    rw = jnp.maximum(x1t - x0t, 0)
    rh = jnp.maximum(y1t - y0t, 0)
    rw_c = jnp.minimum(rw, max_rect)
    rh_c = jnp.minimum(rh, jnp.maximum(max_rect // jnp.maximum(rw_c, 1), 1))
    rect_overflow = jnp.where(valid, rw * rh - rw_c * rh_c, 0).sum()
    # when the rect is clipped, keep the rows nearest the mean (clipping from
    # the top would drop the highest-alpha rows of tall splats)
    mean_ty = jnp.clip(
        jnp.floor(my / TILE_H).astype(jnp.int32), y0t, jnp.maximum(y1t - 1, y0t)
    )
    y0c = jnp.clip(mean_ty - (rh_c - 1) // 2, y0t, jnp.maximum(y1t - rh_c, y0t))

    def pair_fields(r):
        """tile id + candidacy for rect slot r of every gaussian. [P]"""
        rw_s = jnp.maximum(rw_c, 1)
        py_t = y0c + r // rw_s
        px_t = x0t + r % rw_s
        in_rect = (r < rw_c * rh_c) & (py_t < y0c + rh_c) & valid
        # distance from mean to the tile's pixel rect (alpha-bound cull)
        tx0 = (px_t * TILE_W).astype(fdt)
        ty0 = (py_t * TILE_H).astype(fdt)
        dxr = jnp.maximum(jnp.maximum(tx0 - mx, mx - (tx0 + TILE_W - 1)), 0.0)
        dyr = jnp.maximum(jnp.maximum(ty0 - my, my - (ty0 + TILE_H - 1)), 0.0)
        ok = in_rect & (dxr * dxr + dyr * dyr <= r_eff2)
        return jnp.where(ok, py_t * ntx + px_t, T), ok

    rs = jnp.arange(max_rect, dtype=jnp.int32)
    tiles_pr, ok_pr = jax.vmap(pair_fields, out_axes=1)(rs)  # [P, R]

    # dense per-tile prefix counts (depth-rank of each candidate in its tile)
    ones = ok_pr.astype(jnp.int32)
    count_grid = jnp.zeros((T + 1, P), jnp.int32)
    p_cols = jnp.broadcast_to(jnp.arange(P)[:, None], (P, max_rect))
    count_grid = count_grid.at[tiles_pr, p_cols].add(ones, mode="drop")
    prefix = jnp.cumsum(count_grid[:T], axis=1)  # [T, P]
    total = prefix[:, -1]

    # slot of each pair = prefix at (tile, p) minus 1
    flat = prefix.reshape(-1)
    pad_row = jnp.zeros((P,), jnp.int32)
    flat = jnp.concatenate([flat, pad_row])  # row T = sentinel zeros
    slot = flat[tiles_pr * P + p_cols] - 1  # [P, R]

    target = jnp.where(ok_pr & (slot < K) & (slot >= 0), tiles_pr * K + slot, T * K)
    orig = jnp.broadcast_to(order[:, None].astype(jnp.int32), (P, max_rect))
    gather_flat = jnp.zeros((T * K + 1,), jnp.int32)
    gather_flat = gather_flat.at[target.reshape(-1)].set(
        orig.reshape(-1), mode="drop"
    )
    gather_idx = gather_flat[: T * K].reshape(T, K)

    counts = jnp.minimum(total, K)
    slot_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    overflow = (
        jnp.maximum(total - K, 0).sum() + rect_overflow
    ).astype(jnp.int32)
    return Binning(
        gather_idx=gather_idx,
        slot_valid=slot_valid,
        counts=counts.astype(jnp.int32),
        overflow=overflow,
    )

"""Tile binning: per-tile depth-ordered Gaussian lists with static shapes.

TPU-first replacement for the reference's duplicate-keys + radix-sort +
identifyTileRanges pipeline (cuda_rasterizer/rasterizer_impl.cu:70-138,
283-320).  XLA wants static shapes, so instead of variable-length per-tile
ranges we build a dense [num_tiles, K] index table consumed by the Pallas
blend kernel.

Two interchangeable constructions (identical output semantics):

``method='sort'`` (default — the round-2 design, closest in spirit to the
reference's key sort):
  1. every Gaussian emits its clipped tile rect as (tile, depth) candidate
     pairs — a small fixed tier of R1 slots for everyone plus a compacted
     big-rect tier of R2 slots for the few Gaussians whose rect exceeds R1
     tiles (pair volume ~= live candidates, not capacity x P);
  2. ONE sort — default: a packed uint32 [tile | depth-bits] key with the
     original index as tie-break operand (SORT_PACKED, the analogue of the
     reference's 64-bit [tileID | depth-bits] radix sort); the exact
     3-operand (tile, depth, index) lexicographic sort remains available
     for bit-parity against the oracle's full-precision depth order;
  3. per-tile ranges recovered by a vectorized binary search over the
     sorted tile operand (identifyTileRanges equivalent; jnp.searchsorted
     is avoided — it lowers pathologically on TPU);
  4. the [T, K] table is a contiguous gather from the sorted values.
  No scatters anywhere, no [T, P] dense grid, no separate depth argsort.

``method='pairs'`` (the round-1 design, kept as fallback/oracle): depth
argsort + dense [T, P] prefix-count grid + pair scatters.  O(T*P) memory
traffic and three pair-volume scatter/gathers — measured ~4-5x slower at
the bench workload, but useful as an independent construction for tests.

Candidacy of (tile, gaussian) = AABB/tile interval overlap AND the EXACT
alpha-support test: the closed-form minimum of the power quadratic over
the tile's pixel box is compared against ln(255*opacity), so a tile is a
candidate iff at least one of its pixels can pass the alpha >= 1/255
cutoff (the tightest tile-granular cull; see pair_fields).  The AABB
itself is the exact support-ellipse extent from preprocess, so candidacy
as a whole admits no tile the blend could not touch.

Capacity bounds (all REPORTED via `overflow`, never silent):
  * per-tile capacity K keeps the K nearest (depth order) — far splats are
    the most occluded;
  * per-Gaussian rect clipped to max_rect tiles (centered on the mean row);
  * the big-rect tier holds at most `big_capacity` Gaussians (sort method).

Tile geometry: 32 x 32 px spatial tiles (rasterize_ref.py) — compact
squares minimize tiles-overlapped per Gaussian (~30% fewer blend instances
than an 8x128 register-strip tile at equal pixel count).  The blend kernel
still wastes no lanes: one (8,128) vector register holds the whole tile in
p = y*32 + x order and the outputs untile with one XLA transpose.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Preprocessed
from .rasterize_ref import ALPHA_EPS, TILE_H, TILE_W


# Pack (tile, depth) into ONE uint32 sort key: tile id in the top bits,
# the high bits of the positive-f32 depth pattern below (monotone for
# depth > 0), original index as the second sort operand/key.  Probe
# (scripts/probe_sortpack.py, one grant, interleaved): the 2-operand
# packed sort medians 0.925 ms vs 1.188 for the 3-operand sort at 245k
# pairs — multi-operand sorts are NOT flat-cost.  The tie-break among
# depths equal in their kept high bits (~2^-14 relative quantization)
# falls to the index key: DETERMINISTIC, but can differ from the
# oracle's full-precision depth order on near-ties — semantically
# irrelevant (the quantization is ~2^-18 relative at 512^2), but outside
# bit-parity tolerances, so the oracle-parity test modules pin this False
# (conftest exact_depth_sort).  DEFAULT ON since the round-5 in-grant
# A/B: 5.16 -> 5.00 ms/step at the bench point (probe_r5_ab, medians of
# 3 interleaved visits).
SORT_PACKED = True

# Big-tier compaction by stable sort (True) vs the round-2 scatter into a
# slot table (False).  The scatter lowers through the serial emitter at
# 0.24 ms/step with [P]=49k updates even when ZERO members are live
# (round-5 trace, fusion.491); the [P]-row 2-operand stable sort is ~4x
# cheaper and bit-identical (same original-index member order).
BIG_COMPACT_SORT = True


def tile_grid(height: int, width: int):
    nty = -(-height // TILE_H)
    ntx = -(-width // TILE_W)
    return nty, ntx


def row_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] as a BARE lax.gather — rows of a [N, F] table (or scalars
    of a [N] vector) at in-bounds int32 indices of any shape.

    jnp indexing wraps the gather with a negative-index select on the
    indices; fused with that (or any other) elementwise op, XLA's TPU
    backend lowers the whole fusion through a serial ~14 ns/row emitter
    instead of the DMA scatter-gather engine — 50-100x slower at the
    bench shapes (probed; ROADMAP.md S(1) table).  Callers guarantee
    0 <= idx < N (binning produces only in-bounds sentinel indices) and
    wrap producer/consumer in optimization_barrier so nothing re-fuses.
    Autodiff transpose is the matching bare scatter-add.

    PROMISE_IN_BOUNDS makes an out-of-range index silent undefined behavior
    on TPU, so the CPU test path (which interprets every kernel anyway)
    checks the contract loudly here.
    """
    if jax.default_backend() == "cpu" and not isinstance(
        jnp.asarray(idx), jax.core.Tracer
    ):
        lo = int(jnp.min(idx)) if idx.size else 0
        hi = int(jnp.max(idx)) if idx.size else 0
        if lo < 0 or hi >= table.shape[0]:
            raise IndexError(
                f"row_gather index out of bounds: [{lo}, {hi}] vs table "
                f"rows {table.shape[0]} (PROMISE_IN_BOUNDS contract)"
            )
    if table.ndim == 1:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        sizes = (1,)
    else:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(idx.ndim,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        sizes = (1, table.shape[1])
    return jax.lax.gather(
        table, idx[..., None], dn, sizes,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


class Binning(NamedTuple):
    gather_idx: jnp.ndarray  # [T, K] int32 Gaussian index (depth order per tile)
    slot_valid: jnp.ndarray  # [T, K] bool
    counts: jnp.ndarray  # [T] int32 (clamped to K)
    overflow: jnp.ndarray  # [] int32 — candidates dropped by K / max_rect / big tier
    peak: jnp.ndarray  # [] int32 — max per-tile candidate count BEFORE the
    # K clamp; the driver's adaptive tile-capacity policy shrinks K toward
    # the observed peak (the [T,K] gradient tables cost ~15 ns/row to
    # reduce, so idle K rows are pure scatter waste)
    # --- [T, KP] copy of gather_idx padded to KP=1024 columns (sentinel P),
    # the SMEM-block shape Mosaic accepts for rank-1 (KP,) tiles.  Feeds
    # the RMW-accumulator backward (rasterize_pallas.blend_train), which
    # reduces per-instance gradients to per-Gaussian INSIDE the kernel —
    # every XLA-side gather/scatter touching a Pallas result serializes
    # under memory-space pinning (probes s1b/s1d/s1e, ROADMAP.md).  None
    # when K > 1024 or for the pairs method (callers fall back to the
    # table flavor's scatter).
    idx_pad: jnp.ndarray | None = None  # [T, 1024] int32
    # big-tier telemetry (sort method): how many Gaussians exceeded the
    # tier-1 rect this view (pre-clamp) and how many candidate slots were
    # dropped because the big tier was full.  The training driver grows
    # big_capacity on big_overflow like it grows tile_capacity (the
    # reference re-allocates its buffers on demand the same way:
    # rasterizer_impl.cu resizeFunctional).  Zeros for the pairs method.
    big_count: jnp.ndarray | None = None  # [] int32
    big_overflow: jnp.ndarray | None = None  # [] int32


class _Rect(NamedTuple):
    x0t: jnp.ndarray
    y0t: jnp.ndarray
    y1t: jnp.ndarray
    rw_c: jnp.ndarray  # clipped rect width (tiles)
    rh_c: jnp.ndarray  # clipped rect height (tiles)
    y0c: jnp.ndarray  # clipped rect top row (centered on the mean row)
    area: jnp.ndarray  # UNclipped rect area (tiles)
    log_ratio: jnp.ndarray  # ln(opa * 255): alpha-cutoff level set of the
    # power quadratic; <= 0 => no pixel anywhere can pass the alpha gate


def _rect_fields(pre: Preprocessed, nty: int, ntx: int, max_rect: int) -> _Rect:
    mx, my = pre.mean2d[:, 0], pre.mean2d[:, 1]
    ex, ey = pre.extent[:, 0], pre.extent[:, 1]
    conic = pre.conic

    log_ratio = jnp.log(jnp.maximum(pre.opacity, 1e-12) / ALPHA_EPS)

    x0t = jnp.clip(jnp.floor((mx - ex) / TILE_W).astype(jnp.int32), 0, ntx)
    x1t = jnp.clip(jnp.floor((mx + ex) / TILE_W).astype(jnp.int32) + 1, 0, ntx)
    y0t = jnp.clip(jnp.floor((my - ey) / TILE_H).astype(jnp.int32), 0, nty)
    y1t = jnp.clip(jnp.floor((my + ey) / TILE_H).astype(jnp.int32) + 1, 0, nty)
    rw = jnp.maximum(x1t - x0t, 0)
    rh = jnp.maximum(y1t - y0t, 0)
    rw_c = jnp.minimum(rw, max_rect)
    rh_c = jnp.minimum(rh, jnp.maximum(max_rect // jnp.maximum(rw_c, 1), 1))
    # when the rect is clipped, keep the rows nearest the mean (clipping from
    # the top would drop the highest-alpha rows of tall splats)
    mean_ty = jnp.clip(
        jnp.floor(my / TILE_H).astype(jnp.int32), y0t, jnp.maximum(y1t - 1, y0t)
    )
    y0c = jnp.clip(mean_ty - (rh_c - 1) // 2, y0t, jnp.maximum(y1t - rh_c, y0t))
    return _Rect(x0t, y0t, y1t, rw_c, rh_c, y0c, rw * rh, log_ratio)


def _emit_pairs(
    pre: Preprocessed,
    rect: _Rect,
    T: int,
    ntx: int,
    max_rect: int,
    ids: jnp.ndarray | None = None,
):
    """(tile id, candidacy, sort depth, value) [P, R] per rect slot.

    The depth/value columns are emitted INSIDE the same elementwise fusion
    as the tile ids: left to its own devices XLA hoists the [P,R] -> [P*R]
    reshapes above the pair math and materializes every per-Gaussian input
    field at pair volume instead — ~26 standalone broadcast+relayout ops,
    0.82 ms/step at the bench point (round-4 trace).  Callers barrier the
    2-D outputs (see _bin_sort) so exactly three arrays relayout to flat.
    Depth is inf for non-candidates; `ids` defaults to arange(P).
    """
    mx, my = pre.mean2d[:, 0], pre.mean2d[:, 1]
    fdt = mx.dtype
    valid = pre.valid
    conic = pre.conic
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    if ids is None:
        ids = jnp.arange(mx.shape[0], dtype=jnp.int32)

    def pair_fields(r):
        rw_s = jnp.maximum(rect.rw_c, 1)
        py_t = rect.y0c + r // rw_s
        px_t = rect.x0t + r % rw_s
        in_rect = (r < rect.rw_c * rect.rh_c) & (py_t < rect.y0c + rect.rh_c) & valid
        # EXACT alpha cull: a tile is a candidate iff some pixel of it can
        # pass alpha >= ALPHA_EPS, i.e. iff the power quadratic
        # q(d) = 0.5(ca dx^2 + cc dy^2) + cb dx dy reaches log_ratio =
        # ln(opa/ALPHA_EPS) inside the tile's pixel box.  q is PSD
        # (det > 0), so its box minimum is at the origin (if inside) or on
        # one of the four edges, where the 1-D minimizer is -cb*edge/other
        # clamped to the box — five closed-form candidates, all
        # vectorized.  This is the tightest tile-granular cull possible
        # and (unlike the former isotropic lambda_min ball) does not
        # over-admit the empty AABB corners of elongated, diagonal splats
        # — the dominant shape here, since curves sample to thin Gaussian
        # chains.  A small slack on the threshold keeps the cull strictly
        # conservative under f32 rounding.
        tx0 = (px_t * TILE_W).astype(fdt)
        ty0 = (py_t * TILE_H).astype(fdt)
        xl, xh = tx0 - mx, tx0 + (TILE_W - 1) - mx
        yl, yh = ty0 - my, ty0 + (TILE_H - 1) - my

        def q(dx, dy):
            return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        def edge_x(x):
            return q(x, jnp.clip(-cb * x / cc, yl, yh))

        def edge_y(y):
            return q(jnp.clip(-cb * y / ca, xl, xh), y)

        qmin = jnp.minimum(
            jnp.minimum(edge_x(xl), edge_x(xh)),
            jnp.minimum(edge_y(yl), edge_y(yh)),
        )
        inside = (xl <= 0.0) & (0.0 <= xh) & (yl <= 0.0) & (0.0 <= yh)
        qmin = jnp.where(inside, 0.0, qmin)
        ok = in_rect & (qmin <= rect.log_ratio + 1e-4)
        d = jnp.where(ok, pre.depth, jnp.inf)
        return jnp.where(ok, py_t * ntx + px_t, T), ok, d, ids

    rs = jnp.arange(max_rect, dtype=jnp.int32)
    # [R, P] (slot-major): the flatten before the sort is then a contiguous
    # row concatenation instead of a [P, R] T(4,128) -> T(8,128) relayout
    # copy + strided reshape (~0.15 ms/step at the bench point, round-4
    # trace copies .154/.156 + reshapes .2204-.2208).  Sort order is
    # irrelevant to correctness: the 3-key sort includes the original
    # index, and each (gaussian, tile) occurs at most once.
    return jax.vmap(pair_fields, out_axes=0)(rs)  # [R, P] each


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "capacity", "max_rect", "method", "tier1_rect",
        "big_capacity", "packed", "big_sort",
    ),
)
def _bin_gaussians_jit(
    pre, height, width, capacity, max_rect, method, tier1_rect,
    big_capacity, packed, big_sort,
) -> Binning:
    nty, ntx = tile_grid(height, width)
    if method == "sort":
        return _bin_sort(
            pre, nty, ntx, capacity, max_rect, tier1_rect, big_capacity,
            packed=packed, big_sort=big_sort,
        )
    return _bin_pairs(pre, nty, ntx, capacity, max_rect)


def bin_gaussians(
    pre: Preprocessed,
    height: int,
    width: int,
    capacity: int = 1024,
    max_rect: int = 16,
    method: str = "sort",
    tier1_rect: int = 4,
    big_capacity: int = 1024,
    packed: bool | None = None,
    big_sort: bool | None = None,
) -> Binning:
    # `packed=None` resolves the SORT_PACKED module flag HERE (call/trace
    # time) and passes it as a static jit arg, so the jit cache keys on the
    # resolved value — flipping the flag between calls can never hit a
    # stale traced variant (the r4 TRAIN_INDIRECT incident was exactly
    # this class of bug).
    if packed is None:
        packed = SORT_PACKED
    if big_sort is None:
        big_sort = BIG_COMPACT_SORT
    return _bin_gaussians_jit(
        pre, height, width, capacity, max_rect, method, tier1_rect,
        big_capacity, bool(packed), bool(big_sort),
    )


# ---------------------------------------------------------------------------
# sort method
# ---------------------------------------------------------------------------


def _bin_sort(
    pre: Preprocessed,
    nty: int,
    ntx: int,
    K: int,
    max_rect: int,
    tier1_rect: int,
    big_capacity: int,
    packed: bool | None = None,
    big_sort: bool | None = None,
):
    if packed is None:
        packed = SORT_PACKED
    if big_sort is None:
        big_sort = BIG_COMPACT_SORT
    T = nty * ntx
    P = pre.mean2d.shape[0]
    rect = _rect_fields(pre, nty, ntx, max_rect)
    tiles1, _, d1, v1 = _emit_pairs(pre, rect, T, ntx, tier1_rect)

    # big-rect tier: compact Gaussians whose clipped rect exceeds tier1_rect
    # into a fixed budget and emit their remaining slots.  Compaction by
    # STABLE SORT, not scatter: the former [P]-update scatter into
    # slot_tbl lowered through the serial emitter at 0.24 ms/step even
    # with ZERO live members (round-5 trace, fusion.491); a [P]-row
    # 2-operand sort costs ~0.06 ms and yields the members in the same
    # original-index order (stable, key = not-big), so the result is
    # bit-identical.  `pos` (cumsum rank) is kept only for the overflow
    # accounting — it fuses into the surrounding vector work.
    big = pre.valid & (rect.rw_c * rect.rh_c > tier1_rect)
    pos = jnp.cumsum(big.astype(jnp.int32)) - 1
    if big_sort:
        big_count_i = big.sum().astype(jnp.int32)
        _, bsorted = jax.lax.sort(
            (jnp.where(big, 0, 1).astype(jnp.uint32),
             jnp.arange(P, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        if big_capacity > P:  # static pad: the tier can out-size tiny scenes
            bsorted = jnp.concatenate(
                [bsorted, jnp.full((big_capacity - P,), P, jnp.int32)]
            )
        big_idx = jnp.where(
            jnp.arange(big_capacity, dtype=jnp.int32) < big_count_i,
            bsorted[:big_capacity], P,
        )  # [B] original rows (or sentinel P)
    else:  # the round-2 scatter compaction (kept for the A/B)
        slot_tbl = jnp.full((big_capacity + 1,), P, jnp.int32)
        slot_tbl = slot_tbl.at[
            jnp.where(big & (pos < big_capacity), pos, big_capacity)
        ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")
        big_idx = slot_tbl[:big_capacity]

    # per-field big-tier takes: ~6 fused [B]-row gathers, ~0.18 ms/step.
    # A packed [P+1, 12] table + single row_gather was tried (round 4) and
    # is ~2x WORSE overall: the column stack materializes through the
    # S(1)-pinned serial emitter at pair volume (~4 ms) — T(1024) ->
    # T(8,128) interleaves of twelve [P] columns dwarf the gathers saved.
    def take(a):
        return jnp.concatenate([a, jnp.zeros_like(a[:1])])[big_idx]

    pre_big = Preprocessed(
        mean2d=take(pre.mean2d),
        conic=take(pre.conic),
        depth=take(pre.depth),
        opacity=take(pre.opacity),
        radius=take(pre.radius),
        extent=take(pre.extent),
        valid=take(pre.valid) & (big_idx < P),
    )
    rect_big = jax.tree.map(take, rect)
    tiles2, _, d2, v2 = _emit_pairs(
        pre_big, rect_big, T, ntx, max_rect, ids=big_idx
    )
    # tier1 already emitted slots [0, tier1_rect) for every Gaussian
    tiles2, d2, v2 = (
        tiles2[tier1_rect:], d2[tier1_rect:], v2[tier1_rect:]
    )

    # ONE lexicographic sort by (tile, view depth, original index) — the
    # TPU analogue of the reference's 64-bit [tileID | depth-bits] radix
    # sort (rasterizer_impl.cu:70-111).  The index as final key reproduces
    # the oracle's stable-argsort tie-break exactly.  Operand count is NOT
    # free (probe_sortpack, round 4: 2-operand packed 0.925 ms vs 1.188 ms
    # here at 245k pairs) — the SORT_PACKED branch above trades exact
    # depth-tie order for the cheaper packed single-key sort.
    # The barriers pin the emission fusions at [P, R]: without them XLA
    # hoists the flattening reshapes above the pair math and relayouts
    # every input FIELD at pair volume (~26 ops, 0.82 ms/step vs ~0.18 for
    # these six; round-4 trace).
    tiles1, d1, v1 = jax.lax.optimization_barrier((tiles1, d1, v1))
    tiles2, d2, v2 = jax.lax.optimization_barrier((tiles2, d2, v2))
    tiles_flat = jnp.concatenate([tiles1.reshape(-1), tiles2.reshape(-1)])
    depth_flat = jnp.concatenate([d1.reshape(-1), d2.reshape(-1)])
    vals = jnp.concatenate([v1.reshape(-1), v2.reshape(-1)])
    if packed:
        # see the SORT_PACKED note: tile in the top bits (sentinel T
        # included), monotone positive-f32 depth bits below, index as the
        # deterministic tie-break key
        tbits = (T + 1).bit_length()
        dq = jax.lax.bitcast_convert_type(depth_flat, jnp.uint32) >> tbits
        key = (tiles_flat.astype(jnp.uint32) << (32 - tbits)) | dq
        skey, sv = jax.lax.sort((key, vals), num_keys=2)
        st = (skey >> (32 - tbits)).astype(jnp.int32)
    else:
        st, _, sv = jax.lax.sort((tiles_flat, depth_flat, vals), num_keys=3)
    NP = st.shape[0]

    # identifyTileRanges: starts[t] = lower_bound(st, t), vectorized
    # binary search (NOT jnp.searchsorted — pathological lowering on TPU)
    tq = jnp.arange(T + 1, dtype=jnp.int32)
    lo = jnp.zeros((T + 1,), jnp.int32)
    hi = jnp.full((T + 1,), NP, jnp.int32)
    for _ in range(max(NP.bit_length(), 1)):
        mid = (lo + hi) >> 1
        go = st[jnp.minimum(mid, NP - 1)] < tq
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    starts = lo
    raw = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw, K)
    slot_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    # [T, K] table as ONE K-wide window gather per TILE (T gather rows, not
    # T*K): XLA's serial gather emitter costs ~7-17 ns per gather ROW
    # regardless of row width (ROADMAP.md S(1) table), so collapsing the
    # per-slot gather into per-tile slices is ~K x cheaper — probed 1.64 ms
    # -> 0.002 ms at the bench point (scripts/probe_s1_structural.py A1).
    # sv is padded with K sentinels so every window is in bounds; slots
    # past counts[t] land in the next tile's range and are masked to the
    # sentinel P (fields row P is zeros -> alpha 0 in the kernels).
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    # [T, KP] sentinel-padded table for the RMW backward's SMEM idx blocks
    # (see Binning docstring).  When it exists (KP <= 1024, the training
    # config), gather_idx is exactly its first K columns — the window
    # values agree below counts[t] and both mask to the sentinel P above —
    # so ONE window gather serves both tables (each gather lowers as a
    # ~0.22 ms/step serial while-loop under Pallas-chain pinning; round-4
    # trace, while.11/while.12).  KP is the smallest 1024-multiple >= K:
    # Mosaic's rank-1 tiling is (1024), and a (KP,) / (2*KP,) SMEM block
    # must divide it evenly (probed round 5: KP=896 fails hardware
    # lowering with "block shape (1792) is not divisible by tiling (1024)"
    # — the round-2 note claiming 128-alignment suffices was wrong, it was
    # never exercised off 1024).
    KP = -(-K // 1024) * 1024
    idx_pad = None
    if KP <= 1024:
        sv_ext_p = jnp.concatenate([sv, jnp.full((KP,), P, jnp.int32)])
        win_p = jax.lax.gather(
            sv_ext_p, starts[:T, None], dn, (KP,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        idx_pad = jnp.where(
            jnp.arange(KP, dtype=jnp.int32)[None, :] < counts[:, None], win_p, P
        )
        gather_idx = idx_pad[:, :K]
    else:
        sv_ext = jnp.concatenate([sv, jnp.full((K,), P, jnp.int32)])
        win = jax.lax.gather(
            sv_ext, starts[:T, None], dn, (K,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        gather_idx = jnp.where(slot_valid, win, P)

    rect_overflow = jnp.where(
        pre.valid, rect.area - rect.rw_c * rect.rh_c, 0
    ).sum()
    big_overflow = jnp.where(
        big & (pos >= big_capacity), rect.rw_c * rect.rh_c - tier1_rect, 0
    ).sum().astype(jnp.int32)
    overflow = (
        jnp.maximum(raw - K, 0).sum() + rect_overflow + big_overflow
    ).astype(jnp.int32)
    return Binning(
        gather_idx=gather_idx,
        slot_valid=slot_valid,
        counts=counts.astype(jnp.int32),
        overflow=overflow,
        peak=jnp.max(raw).astype(jnp.int32),
        idx_pad=idx_pad,
        big_count=big.sum().astype(jnp.int32),
        big_overflow=big_overflow,
    )


# ---------------------------------------------------------------------------
# pairs method (round-1 design; independent construction used as test oracle)
# ---------------------------------------------------------------------------


def _bin_pairs(pre: Preprocessed, nty: int, ntx: int, K: int, max_rect: int):
    T = nty * ntx
    P = pre.mean2d.shape[0]

    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
    pre_s = jax.tree.map(lambda a: a[order], pre)
    rect = _rect_fields(pre_s, nty, ntx, max_rect)
    tiles_pr, ok_pr, _, _ = _emit_pairs(pre_s, rect, T, ntx, max_rect)
    tiles_pr, ok_pr = tiles_pr.T, ok_pr.T  # this method indexes [P, R]
    rect_overflow = jnp.where(
        pre_s.valid, rect.area - rect.rw_c * rect.rh_c, 0
    ).sum()

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
    gather_flat = jnp.full((T * K + 1,), P, jnp.int32)  # sentinel P default
    gather_flat = gather_flat.at[target.reshape(-1)].set(
        orig.reshape(-1), mode="drop"
    )
    gather_idx = gather_flat[: T * K].reshape(T, K)

    counts = jnp.minimum(total, K)
    slot_valid = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    overflow = (
        jnp.maximum(total - K, 0).sum() + rect_overflow
    ).astype(jnp.int32)
    z = jnp.zeros((), jnp.int32)
    return Binning(
        gather_idx=gather_idx,
        slot_valid=slot_valid,
        counts=counts.astype(jnp.int32),
        overflow=overflow,
        peak=jnp.max(total).astype(jnp.int32),
        big_count=z,
        big_overflow=z,
    )

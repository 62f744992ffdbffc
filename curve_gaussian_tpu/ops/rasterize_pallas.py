"""Pallas TPU tile-blend kernels (forward + hand-derived backward).

The only part of the renderer that is inherently sequential (front-to-back
alpha compositing) lives here; everything around it — preprocessing, tile
binning, payload gathers, exposure — is plain differentiable jnp that XLA
fuses and autodiffs.

Forward mirrors the semantics of the reference renderCUDA<1,4>
(cuda_rasterizer/forward.cu:279-417); backward re-derives the gradient with
the prefix-accumulator identity instead of the reference's back-to-front
re-rasterization + atomicAdd (backward.cu:453-675):

    Out_ch = sum_j ch_j * alpha_j * T_j (+ bg * T_N for the color channel)
    dOut_ch/dalpha_j = ch_j T_j - S_j / (1 - alpha_j),
    S_j = Out_ch - prefix_j  (prefix includes j)
    dT_N/dalpha_j = -T_N / (1 - alpha_j)

so one front-to-back pass with running prefixes produces exact gradients.
Per-instance gradients are written to a dense [tiles, K, NF] table (no
atomics) and flow back to Gaussians through the autodiff transpose of the
payload gather (XLA's deterministic scatter-add).

Memory-access design (probed against Mosaic on v5e): per-instance fields
are read as SCALARS from the VMEM payload block — `ref[0, j, f]` with a
dynamic sublane index and static lane index lowers to a scalar load + splat
and measured ~4x faster than slab loads with static extraction.  (1,1)->
(8,128) vector broadcasts and scalar VMEM stores are NOT implemented in
Mosaic, so the backward keeps its per-instance gradients in vector
registers: sublane-reduced partials are parked per instance, one lane
reduction per gradient finishes each 8-instance group, and the assembled
(8, NF) slab is stored with an 8-aligned dynamic sublane slice."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, Binning, row_gather
from .projection import Preprocessed
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

# native VPU register shape; one register holds one TILE_H x TILE_W spatial
# tile (pixel p = 128*s + l maps to tile coords (p // TILE_W, p % TILE_W))
REG_H = 8
REG_W = 128
assert TILE_H * TILE_W == REG_H * REG_W

def field_layout(geo: bool, invd: bool, ones: bool):
    """Payload lane layout for a channel configuration.

    The training path (ones color, no allmap/invdepth) needs only the 6
    geometry fields, halving payload-gather and gradient-table volume vs
    the full render layout.  NF is padded to a multiple of 8.  There are
    no extent fields: like the reference CUDA, candidacy is decided at
    tile granularity by the binning; the kernel applies only the per-pixel
    power/alpha cutoffs (forward.cu:336-372).
    """
    names = ["mx", "my", "ca", "cb", "cc", "opa"]
    if not ones:
        names.append("col")
    if invd:
        names.append("invd")
    if geo:
        names += ["am0", "am1", "am2", "am3"]
    nf = -(-len(names) // 8) * 8
    return {n: i for i, n in enumerate(names)}, nf

# instance group sizes: forward carries only (T, act, C...) tiles, so a wide
# group amortizes the while_loop + liveness-reduce overhead (probed ~16
# ns/instance at chunk 32; chunk 64 buys another ~6%); backward parks 12
# (CHUNK, 128) partial buffers, so it stays narrow to avoid register
# spills.  Both are multiples of the 8-sublane alignment required for the
# dpay slab store.
_FWD_CHUNK = 64
_CHUNK = 8
_PIPE = 8  # phase-1/phase-2 sub-group width inside a fwd group
_BPIPE = 4  # phase-1 sub-group width inside a bwd group (register pressure)
# moment-backward group width (slab RMW stays 8 rows): the while_loop +
# liveness-reduce overhead is ~0.5 us per GROUP (probed round 2), so the
# round-3 width of 8 cost ~64 ns/instance of pure loop overhead at the
# bench point's ~62k real instances — wider groups amortize it.  Falls
# back to 16/8 when K is not a multiple (tail reads must stay in [0, K)).
_BWD_GROUP = 32
# training blend processes TWO adjacent tiles per program (even ntx only):
# their independent serial chains interleave in one instruction stream, so
# the per-group loop overhead is shared and each chain's ~6-op serial
# dependency hides behind the other tile's vector work.  Costs the pair
# max(n_a, n_b) group iterations (adjacent tiles correlate).
PAIRED_BLEND = True
_PPIPE = 4  # phase-1 sub-group width per tile inside a paired group
# training blend flavor: indirect (no [T,K,NF] payload table; fields ride
# ONE constant-index-map VMEM block, per-tile SMEM index lists resolve
# instances in-kernel).  Round-4 probe_r4_fwdcost found the payload path's
# true cost is DMA, not compute: the (·,K,NF=8) blocks transfer 8-lane
# rows at ~2.5 ns/row (VMEM tile padding), ~2 us per tile per kernel, plus
# the 0.4 ms/step XLA payload gather.  The indirect flavor re-tested a
# round-2 loser under this round's cost model.  Paired even-ntx only.
# VERDICT (probe_r4_ab, one grant, interleaved): indirect LOSES 5.5 ->
# 6.8 ms/step — the dependent idx->fields scalar-load chain costs more
# in-kernel than the payload gather + block DMA it removes.  Default OFF.
TRAIN_INDIRECT = False
# moment-backward scratch mode: reduced (sublane-sum each moment map to a
# (1,128) row in registers, VPU lane-sum combiner) vs full (six (8,128)
# map stores per instance + MXU one-hot combiner).  probe_r4_bwdcost
# attributed ~46% of the kernel to the full-map stores; A/B in ONE
# process decides the default (grants differ ~10x across processes).
# VERDICT (probe_r4_ab, one grant, interleaved): reduced LOSES 5.55 ->
# 5.86 ms/step — full-tile (8,128) stores pipeline well; the sublane
# reduction + single-row stores cost more than the traffic they save.
BWD_SCR_REDUCED = False

# training-config backward flavor: moment-scratch (MXU combiner) vs the
# parking kernel.  Module-level so benchmarks can A/B them in one process.
USE_MOMENT_BWD = True
# moment backward formulation: direct central moments (six scratch rows
# per instance; round 3) vs the pixel-moment-basis experiment (ONE Dp
# scratch row + two MXU basis dots; round 4).  MEASURED LOSER on v5e:
# in-step 9.67 ms vs 7.36 ms at the bench point (probe_r4_bwd) — the six
# scratch stores pipeline under the serial T-chain, while the narrow
# (…,8)-lane basis dots (forced to Precision.HIGHEST for gradient
# accuracy) stall each group.  Kept A/B-able; trace-time constant, probes
# flip it with fresh jits.
USE_BASIS_BWD = False

# moment-scratch precision: bf16 halves the backward's dominant VMEM
# traffic — the six (8,128) moment-map stores per instance plus their
# combiner re-reads were ~46% of the kernel (probe_r4_bwdcost; 'reduced'
# single-row stores and the MXU basis reformulation both measured WORSE,
# see BWD_SCR_REDUCED / USE_BASIS_BWD).  Numerics: only the STORED maps
# round to bf16 (~0.4% per element); the one-hot combiner runs them
# through the MXU's native-bf16 path with f32 accumulation, and the
# per-Gaussian slab RMW stays f32 — expected moment error ~1e-3 relative
# (quality-gated by tests/test_rasterize.py::test_bf16_scratch_accuracy).
# DEFAULT ON since the round-5 in-grant A/B: 5.16 -> 5.01 ms/step at the
# bench point, composing with SORT_PACKED/FWD_CONSERVE to 4.87
# (probe_r5_ab, medians of 3 interleaved visits).  The f32-parity test
# modules pin this False (conftest exact_depth_sort fixture pins BOTH
# order- and precision-affecting flags).  HARDWARE ONLY: CPU XLA
# emulates bf16 at ~16x the f32 cost in interpreted kernels (probed
# round 5: 2.40 vs 0.15 s per interpreted backward), so interpret mode
# keeps f32 scratch unless BWD_SCR_BF16_FORCE is set (the quality-gate
# test sets it; hardware semantics are otherwise identical).
BWD_SCR_BF16 = True
BWD_SCR_BF16_FORCE = False


def _scr_bf16() -> bool:
    return BWD_SCR_BF16 and (BWD_SCR_BF16_FORCE or not _interpret())
# ... and the same trade for the per-Gaussian slab ACCUMULATOR the RMW
# read-modify-writes (8 KB r+w per instance at f32, ~0.6 ms/step).  Each
# gaussian accumulates only ~1.3 instances/view at the bench point, so
# bf16 rounding of the running sum adds ~2^-9 relative on top of the
# scratch rounding.  Gated by the same quality test; pinned False in the
# parity modules alongside BWD_SCR_BF16.
BWD_ACC_BF16 = False

# ones-color forward conservation identity (ROADMAP round-4 item 1): with
# every splat's color == 1, each blend step moves weight w from T to the
# color accumulator, so col == 1 - T_final EXACTLY in real arithmetic
# (col_out = 1 - T*(1-bg)) — the forward needs NO accumulator at all.
# Drops one vector add per instance AND two (8,128) loop carries from the
# paired kernel (register pressure).  f32 result differs from the
# accumulate form only by summation-order rounding (<= a few ulps; the
# oracle-parity tolerance covers it).
FWD_CONSERVE = True


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


_LOG2E = 1.4426950408889634
# degree-5 LSQ fit of 2^f on [0,1]; max rel err ~1e-6 in f32 Horner
_EXP_C = (9.9999976963e-01, 6.9315677670e-01, 2.4013169187e-01,
          5.5876556869e-02, 8.9405825293e-03, 1.8943794234e-03)

# Schraudolph one-mul exp (A/B flag): exp(x) ~= bitcast(i32(A*x) + B) with
# A = 2^23/ln 2 and B the bias constant minimizing max relative error
# (~±3%).  4 VPU ops vs ~14 for the poly5 bit-trick — fast_exp is ~12 of
# ~33 phase-1 ops in BOTH blend kernels, so this trades ~3% alpha error
# (the fwd/bwd kernels stay mutually consistent: gradients are of the
# approximated kernel shape) for a sizeable ALU cut.  Deeply-negative
# powers: the f32->i32 convert saturates, the +B leaves a negative int,
# the bitcast yields a negative float, and the alpha >= ALPHA_EPS cut
# filters it — no wraparound path to a fake opaque pixel (the failure
# mode the poly5 clamp guards).  Default OFF until the A/B shows a win
# and e2e quality is re-verified (probe_r4_ab).
FAST_EXP_CHEAP = False
_SCHRAUD_A = 12102203.0  # 2^23 / ln 2
_SCHRAUD_B = 1064866805  # 127*2^23 - 486411 (minimax bias)


def _fast_exp(x):
    """exp(x) as 2^n * poly(frac) — Mosaic lowers jnp.exp ~17 ns/call on an
    (8,128) register (half the whole blend cost, probed v5e); this bit-trick
    construction is ~6x cheaper at 1e-6 relative error, well inside the
    rasterizer's alpha tolerances.  n is clamped to +-127 BEFORE the
    exponent-field shift: un-clamped, power ~ -2e4 (a far pixel against a
    tight conic) wraps the int32 shift and fabricates a HUGE scale, turning
    empty pixels opaque (observed, not hypothetical).  n = -127 maps to
    ni = 0 -> 0.0, an exact flush for any alpha below threshold.

    CPU interpret mode keeps libm exp: the 12-op construction costs ~3x in
    per-op interpretation and the tests' tolerances cover the 1e-6 gap."""
    if _interpret():
        return jnp.exp(x)
    if FAST_EXP_CHEAP:
        # Two clamps make EVERY reachable bit pattern a finite >= 0 float:
        # the f32 clip keeps the i32 convert in-range (out-of-range convert
        # is implementation-defined), and the i32 max(., 0) kills the
        # zi in [-2^23, -1] band whose patterns are NaN/-inf — the forward
        # cand filter hides those, but the backward's Dp = 0 * G would
        # turn them into NaN moments and poison the whole accumulator
        # (observed: first step's grads all-NaN).  Upper bound: zi <=
        # B + 2^30 = 2138608629 < 0x7F800000, so no +inf band either.
        z = jnp.clip(x * _SCHRAUD_A, -1.073741824e9, 1.073741824e9)
        zi = jnp.maximum(z.astype(jnp.int32) + _SCHRAUD_B, 0)
        return jax.lax.bitcast_convert_type(zi, jnp.float32)
    return fast_exp_bits(x)


def fast_exp_bits(x):
    """The bit-trick exp itself (ungated; see _fast_exp for the rationale)."""
    z = x * _LOG2E
    n = jnp.floor(z)
    f = z - n
    p = _EXP_C[5]
    for k in (4, 3, 2, 1, 0):
        p = p * f + _EXP_C[k]
    n = jnp.clip(n, -127.0, 127.0)
    ni = (n.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(ni, jnp.float32) * p


def build_payload(
    pre: Preprocessed,
    color: jnp.ndarray,
    allmap: jnp.ndarray,
    binning: Binning,
    geo: bool = True,
    invd: bool = True,
    ones: bool = False,
) -> jnp.ndarray:
    """Gather per-Gaussian fields into the [T, K, NF] per-tile table.

    Pure jnp: its autodiff transpose is exactly the deterministic
    segment-sum of per-instance gradients back to Gaussians.  The field
    set matches field_layout(geo, invd, ones).

    Empty slots are zeroed through the binning's sentinel index P against
    an appended zero row — NOT a jnp.where mask: a masked gather fuses
    with the select and XLA lowers the fusion through a serial ~14 ns/row
    emitter (3.2 ms at the bench point), while a LONE gather root takes
    the DMA scatter-gather engine at ~0.03 ms (probed, ROADMAP.md).  The
    optimization_barrier pair keeps producers/consumers from re-fusing
    into it; its autodiff transpose is itself, so the backward scatter-add
    is insulated the same way.
    """
    idx = binning.gather_idx  # [T, K] (sentinel P at empty slots)
    L, nf = field_layout(geo, invd, ones)
    cols = [
        pre.mean2d[:, 0],
        pre.mean2d[:, 1],
        pre.conic[:, 0],
        pre.conic[:, 1],
        pre.conic[:, 2],
        pre.opacity,
    ]
    if "col" in L:
        cols.append(color)
    if "invd" in L:
        # guard: culled rows may sit at arbitrary depth; 1/0 -> inf would
        # turn the zero cotangent into NaN in the gather transpose
        cols.append(
            jnp.where(pre.valid, 1.0 / jnp.where(pre.valid, pre.depth, 1.0), 0.0)
        )
    if "am0" in L:
        cols += [allmap[:, 0], allmap[:, 1], allmap[:, 2], allmap[:, 3]]
    cols += [jnp.zeros_like(color)] * (nf - len(cols))
    fields = jnp.stack(cols, axis=-1)  # [P, NF]
    fields = jnp.concatenate(
        [fields, jnp.zeros((1, nf), fields.dtype)], axis=0
    )  # row P = sentinel zeros
    fields, idx = jax.lax.optimization_barrier((fields, idx))
    payload = row_gather(fields, idx)  # [T, K, NF]
    return jax.lax.optimization_barrier(payload)


def stack_fields(
    pre: Preprocessed,
    color: jnp.ndarray,
    allmap: jnp.ndarray,
    geo: bool = True,
    invd: bool = True,
    ones: bool = False,
) -> jnp.ndarray:
    """[P+1, NF] compact per-Gaussian field rows for the indirect kernels.

    Row P is zeros: the binning writes sentinel index P for empty slots, so
    an in-kernel indirect read of an empty slot blends alpha = 0.  Unlike
    build_payload there is no [T, K, NF] gather — the per-tile indirection
    happens inside the kernel from an SMEM index block, which removes the
    payload-gather stage (and its HBM traffic) from the step entirely.
    """
    L, nf = field_layout(geo, invd, ones)
    cols = [
        pre.mean2d[:, 0],
        pre.mean2d[:, 1],
        pre.conic[:, 0],
        pre.conic[:, 1],
        pre.conic[:, 2],
        pre.opacity,
    ]
    if "col" in L:
        cols.append(color)
    if "invd" in L:
        cols.append(
            jnp.where(pre.valid, 1.0 / jnp.where(pre.valid, pre.depth, 1.0), 0.0)
        )
    if "am0" in L:
        cols += [allmap[:, 0], allmap[:, 1], allmap[:, 2], allmap[:, 3]]
    cols += [jnp.zeros_like(color)] * (nf - len(cols))
    fields = jnp.stack(cols, axis=-1)  # [P, NF]
    P = fields.shape[0]
    pad = -(-(P + 1) // 8) * 8 - P  # sentinel row + round rows up to 8
    return jnp.concatenate([fields, jnp.zeros((pad, nf), fields.dtype)], axis=0)


def _pixel_grids(dtype):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    # register (s, l) = tile pixel p = 128 s + l at (p // TILE_W, p % TILE_W).
    # Mosaic only lowers integer iota; cast afterwards.
    il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
    is_ = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 0)
    p = is_ * REG_W + il
    px = (tx * TILE_W + p % TILE_W).astype(dtype)
    py = (ty * TILE_H + p // TILE_W).astype(dtype)
    return px, py


def _count(counts_ref):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    ntx = pl.num_programs(1)
    return counts_ref[ty * ntx + tx]


def _f(payload_ref, j, f: int):
    """Scalar load of instance j's field f (dynamic sublane, static lane)."""
    return payload_ref[0, j, f]


def _channels(geo: bool, invd: bool):
    """Accumulated channel names: color always; invdepth/allmap optional."""
    chans = ["col"]
    if invd:
        chans.append("invd")
    if geo:
        chans.extend(f"am{i}" for i in range(4))
    return chans


@functools.lru_cache(maxsize=None)
def _make_fwd_kernel(geo: bool, invd: bool, ones: bool, indirect: bool = False):
    chans = _channels(geo, invd)
    L, _ = field_layout(geo, invd, ones)
    nch = len(chans)

    def body(get, counts_ref, bg_ref, col_ref, invd_ref, t_ref, am_ref, fdt):
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        one = zero + 1.0
        # ones-color conservation (FWD_CONSERVE): col == 1 - T exactly, so
        # the col accumulator (and its per-instance add) is dropped and the
        # channel derives from the transmittance at the end
        acc_chans = [
            ch for ch in chans if not (ones and FWD_CONSERVE and ch == "col")
        ]

        # two-phase pipeline: per _PIPE-instance sub-group, first compute
        # every instance's gated alpha INDEPENDENTLY (no cross-instance
        # deps -> the VPU's parallel ALUs stay fed), then run a short
        # serial composite sweep whose per-instance dependency chain is
        # ~5 float ops (vs ~30 in the naive blend-at-a-time ordering).
        # Float mask algebra (act/live as {0,1} floats) replaces the
        # boolean selects: with aT = alpha*T,
        #   w  = aT * act * live        (live = [T - aT >= T_EPS])
        #   T' = T - w                  (== T*(1-alpha) when contributing)
        #   act' = act * (live if alpha > 0 else 1)
        # reproduces the reference's test_T / newly_done / contrib rules
        # exactly (act==1 implies T >= T_EPS, so non-candidates never
        # trip live; a tripping candidate freezes T and kills the pixel).
        def phase1(j):
            gf = get(j)
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, gf(L["opa"]) * _fast_exp(power))
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            chv = tuple(
                None if (ones and ch == "col") else gf(L[ch]) for ch in chans
            )
            return ag, chv

        def group_cond(st):
            g, state = st
            return (g * _FWD_CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            T, act, accs = state
            for s in range(_FWD_CHUNK // _PIPE):
                pre = [phase1(g * _FWD_CHUNK + s * _PIPE + i)
                       for i in range(_PIPE)]
                ws = []
                for ag, _ in pre:
                    aT = ag * T
                    ta = T - aT
                    live = jnp.where(ta >= T_EPS, one, zero)
                    w = aT * (act * live)
                    act = act * jnp.where(ag > 0.0, live, one)
                    T = T - w
                    ws.append(w)
                # channel accumulation off the serial path (tree-summable)
                accs = tuple(
                    acc + sum(
                        w if (ones and ch == "col") else chv[chans.index(ch)] * w
                        for w, (_, chv) in zip(ws, pre)
                    )
                    for acc, ch in zip(accs, acc_chans)
                )
            return (g + 1, (T, act, accs))

        init = (one, one, (zero,) * len(acc_chans))
        _, (T, _, accs) = jax.lax.while_loop(
            group_cond, group_body, (jnp.int32(0), init)
        )
        by_ch = dict(zip(acc_chans, accs))
        if "col" in by_ch:
            col = by_ch["col"] + T * bg_ref[0]
        else:  # conservation identity (see acc_chans above)
            col = 1.0 - T * (1.0 - bg_ref[0])
        col_ref[:, :] = col
        invd_ref[:, :] = by_ch.get("invd", zero)
        t_ref[:, :] = T
        for i in range(4):
            am_ref[i, :, :] = by_ch.get(f"am{i}", zero)

    if indirect:

        def kernel(counts_ref, bg_ref, idx_ref, fields_ref,
                   col_ref, invd_ref, t_ref, am_ref):
            def get(j):
                g = idx_ref[j]
                return lambda f: fields_ref[g, f]

            body(get, counts_ref, bg_ref, col_ref, invd_ref, t_ref, am_ref,
                 fields_ref.dtype)

    else:

        def kernel(counts_ref, bg_ref, payload_ref,
                   col_ref, invd_ref, t_ref, am_ref):
            def get(j):
                return lambda f: payload_ref[0, j, f]

            body(get, counts_ref, bg_ref, col_ref, invd_ref, t_ref, am_ref,
                 payload_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel(geo: bool, invd: bool, ones: bool, indirect: bool = False):
    chans = _channels(geo, invd)
    L, NF = field_layout(geo, invd, ones)

    def body(
        get,
        fdt,
        counts_ref,
        bg_ref,
        outc_ref,
        outd_ref,
        outt_ref,
        outam_ref,
        gc_ref,
        gd_ref,
        gt_ref,
        gam_ref,
        dpay_ref,
    ):
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        dpay_ref[...] = jnp.zeros(dpay_ref.shape, fdt)

        outt = outt_ref[:, :]
        gt = gt_ref[:, :]
        # per-channel (upstream grad, final output) keyed by channel name
        gch = {"col": gc_ref[:, :]}
        och = {"col": outc_ref[:, :]}
        if invd:
            gch["invd"] = gd_ref[:, :]
            och["invd"] = outd_ref[:, :]
        if geo:
            for i in range(4):
                gch[f"am{i}"] = gam_ref[i, :, :]
                och[f"am{i}"] = outam_ref[i, :, :]

        # gradient accumulation strategy: the 6+nch per-instance gradients
        # are reductions over the (8,128) pixel tile.  Full reductions per
        # instance are the backward's hot cost, so they are DEFERRED: per
        # instance only the sublanes are reduced ((8,128)->(1,128), cheap)
        # and parked in the instance's row of a per-gradient group buffer;
        # after each 8-instance group ONE lane reduction per gradient
        # finishes all 8 instances at once.  (Mosaic has no scalar VMEM
        # stores / both-dim broadcasts, hence the iota-mask row selects.)
        # channel-value grads parked back to payload lanes; the all-ones
        # color carries no payload lane (and its grad is discarded upstream)
        grad_chans = [ch for ch in chans if not (ones and ch == "col")]
        NG = 6 + len(grad_chans)  # mx,my,ca,cb,cc,opa + channel grads
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, REG_W), 0)
        zbuf = jnp.zeros((_CHUNK, REG_W), fdt)

        def park(buf, i: int, v):
            partial = jnp.sum(v, axis=0, keepdims=True)  # (1, REG_W)
            return jnp.where(sub8 == i, partial, buf)

        lane16 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, NF), 1)
        zrow = jnp.zeros((_CHUNK, NF), fdt)
        grad_fields = [
            L["mx"], L["my"], L["ca"], L["cb"], L["cc"], L["opa"]
        ] + [L[ch] for ch in grad_chans]

        def finish_group(bufs):
            rows = zrow
            for f, buf in zip(grad_fields, bufs):
                col = jnp.sum(buf, axis=1, keepdims=True)  # (CHUNK, 1)
                rows = rows + jnp.where(lane16 == f, col, zrow)
            return rows

        one = zero + 1.0

        # same two-phase pipeline as the forward (see its body): phase 1
        # computes every instance's gated alpha/G independently, the serial
        # sweep keeps only the ~6-op T/act/prefix chain, and the gradient
        # expressions + parking hang off recorded w/T_i values where the
        # scheduler can overlap them across instances.
        def phase1(j):
            gf = get(j)
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            opa = gf(L["opa"])
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = _fast_exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            chv = {
                ch: (1.0 if (ones and ch == "col") else gf(L[ch]))
                for ch in chans
            }
            return ag, G, dx, dy, (ca, cb, cc, opa), chv

        def group_cond(st):
            g, state = st
            return (g * _CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            T, act, prefixes, _ = state
            bufs = (zbuf,) * NG
            for s in range(_CHUNK // _BPIPE):
                pre = [phase1(g * _CHUNK + s * _BPIPE + i)
                       for i in range(_BPIPE)]
                for i, (ag, G, dx, dy, (ca, cb, cc, opa), chv) in enumerate(pre):
                    aT = ag * T
                    ta = T - aT
                    live = jnp.where(ta >= T_EPS, one, zero)
                    w = aT * (act * live)
                    act = act * jnp.where(ag > 0.0, live, one)
                    T_i = T
                    T = T - w
                    prefixes = tuple(
                        A + chv[ch] * w for A, ch in zip(prefixes, chans)
                    )
                    by_ch = dict(zip(chans, prefixes))

                    inv1a = 1.0 / (1.0 - ag)
                    g_alpha = gt * (-outt * inv1a)
                    for ch in chans:
                        g_alpha += gch[ch] * (
                            chv[ch] * T_i - (och[ch] - by_ch[ch]) * inv1a
                        )
                    g_alpha = g_alpha * jnp.where(w > 0.0, one, zero)

                    d_power = g_alpha * (opa * G)
                    vals = [
                        d_power * (-ca * dx - cb * dy),
                        d_power * (-cc * dy - cb * dx),
                        d_power * (-0.5 * dx * dx),
                        d_power * (-dx * dy),
                        d_power * (-0.5 * dy * dy),
                        g_alpha * G,
                    ] + [gch[ch] * w for ch in grad_chans]
                    bufs = tuple(
                        park(buf, s * _BPIPE + i, v)
                        for buf, v in zip(bufs, vals)
                    )
            off = pl.multiple_of(g * _CHUNK, _CHUNK)
            dpay_ref[0, pl.ds(off, _CHUNK), :] = finish_group(bufs)
            return (g + 1, (T, act, prefixes, bufs))

        init = (
            zero + 1.0,
            zero + 1.0,
            (zero,) * len(chans),
            (zbuf,) * NG,
        )
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

    if indirect:

        def kernel(counts_ref, bg_ref, idx_ref, fields_ref, *refs):
            def get(j):
                g = idx_ref[j]
                return lambda f: fields_ref[g, f]

            body(get, fields_ref.dtype, counts_ref, bg_ref, *refs)

    else:

        def kernel(counts_ref, bg_ref, payload_ref, *refs):
            def get(j):
                return lambda f: payload_ref[0, j, f]

            body(get, payload_ref.dtype, counts_ref, bg_ref, *refs)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_bwd_moment_kernel(indirect: bool = True):
    """Training-config backward (ones color, no geo/invd): moment scratch.

    Instead of computing the 6 per-instance gradient expressions and
    parking their reductions (the parking kernel above), each instance
    stores six weighted pixel rows to a VMEM scratch —
        D', D'dx, D'dy, D'dx^2, D'dxdy, D'dy^2   (D' = g_alpha * G)
    — at static sublane offsets, and each 8-instance group reduces them
    with small MXU dots (an (8,64) one-hot block-sum combiner) into per-
    slot moment rows [T, K, 8].  The moment -> field-gradient conversion
    is linear with per-GAUSSIAN coefficients, so it runs as fused XLA
    elementwise AFTER the slot->Gaussian scatter (no per-slot gathers):
        d_opa = M0;  d_mx = -opa(ca M1 + cb M2);  d_my = -opa(cc M2 + cb M1)
        d_ca = -opa M3/2;  d_cb = -opa M4;  d_cc = -opa M5/2
    This drops ~40% of the per-instance VPU ops of the parking backward
    (5 gradient expressions + 12 park selects -> 5 muls + 6 stores) and
    moves the reductions to the otherwise-idle MXU.
    """
    L, NF = field_layout(False, False, True)

    def body(get, fdt, counts_ref, bg_ref, outc_ref, outt_ref,
             gc_ref, gt_ref, mom_ref, scr_ref):
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        mom_ref[...] = jnp.zeros(mom_ref.shape, fdt)
        outt = outt_ref[:, :]
        gt = gt_ref[:, :]
        gc = gc_ref[:, :]
        outc = outc_ref[:, :]

        rows_per = _CHUNK * REG_H  # 64 scratch rows per moment
        gi = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, rows_per), 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, rows_per), 1)
        S = jnp.where(ri // REG_H == gi, 1.0, 0.0).astype(fdt)  # (8, 64)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, NF), 1)
        zrow = jnp.zeros((_CHUNK, NF), fdt)

        one = zero + 1.0

        # two-phase pipeline (see the forward kernel body): independent
        # candidacy phase, ~6-op serial composite chain, moment stores
        # hang off recorded values outside the chain
        def phase1(j):
            gf = get(j)
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            opa = gf(L["opa"])
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = _fast_exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            return ag, G, dx, dy

        def group_cond(st):
            g, state = st
            return (g * _CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            T, act, pref = state
            for s in range(_CHUNK // _BPIPE):
                pre = [phase1(g * _CHUNK + s * _BPIPE + i)
                       for i in range(_BPIPE)]
                for i, (ag, G, dx, dy) in enumerate(pre):
                    aT = ag * T
                    ta = T - aT
                    live = jnp.where(ta >= T_EPS, one, zero)
                    w = aT * (act * live)
                    act = act * jnp.where(ag > 0.0, live, one)
                    T_i = T
                    T = T - w
                    pref = pref + w  # inclusive ones-color prefix

                    inv1a = 1.0 / (1.0 - ag)
                    g_alpha = gt * (-outt * inv1a) + gc * (
                        T_i - (outc - pref) * inv1a
                    )
                    g_alpha = g_alpha * jnp.where(w > 0.0, one, zero)
                    Dp = g_alpha * G
                    e1 = Dp * dx
                    e2 = Dp * dy
                    for k, v in enumerate(
                        (Dp, e1, e2, e1 * dx, e1 * dy, e2 * dy)
                    ):
                        scr_ref[
                            pl.ds(
                                rows_per * k + REG_H * (s * _BPIPE + i),
                                REG_H,
                            ),
                            :,
                        ] = v
            state = (T, act, pref)
            rows = zrow
            for k in range(6):
                blk = scr_ref[pl.ds(rows_per * k, rows_per), :]  # (64, 128)
                Ak = jax.lax.dot_general(
                    S, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=fdt,
                )  # (8, 128): per-instance sublane sums
                col = jnp.sum(Ak, axis=1, keepdims=True)  # (8, 1)
                rows = rows + jnp.where(lane8 == k, col, zrow)
            off = pl.multiple_of(g * _CHUNK, _CHUNK)
            mom_ref[0, pl.ds(off, _CHUNK), :] = rows
            return (g + 1, state)

        init = (zero + 1.0, zero + 1.0, zero)
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

    if indirect:

        def kernel(counts_ref, bg_ref, idx_ref, fields_ref, *refs):
            def get(j):
                g = idx_ref[j]
                return lambda f: fields_ref[g, f]

            body(get, fields_ref.dtype, counts_ref, bg_ref, *refs)

    else:

        def kernel(counts_ref, bg_ref, payload_ref, *refs):
            def get(j):
                return lambda f: payload_ref[0, j, f]

            body(get, payload_ref.dtype, counts_ref, bg_ref, *refs)

    return kernel


def _make_bwd_moment_rmw_basis_kernel(PR: int, L):
    """basis=True flavor of _make_bwd_moment_rmw_kernel (see its docstring)."""

    def kernel(counts_ref, bg_ref, idx_ref, payload_ref,
               outc_ref, outt_ref, gc_ref, gt_ref, acc_out_ref,
               scr_ref, acc_ref):
        fdt = payload_ref.dtype
        t = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        tx = pl.program_id(1)
        ty = pl.program_id(0)
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        outt = outt_ref[:, :]
        gt = gt_ref[:, :]
        gc = gc_ref[:, :]
        outc = outc_ref[:, :]
        base_inv = -gt * outt - gc * outc

        @pl.when(t == 0)
        def _init():
            acc_ref[...] = jnp.zeros(acc_ref.shape, fdt)

        rows_per = _CHUNK * REG_H  # 64 Dp scratch rows per group
        # lane basis B [128, 8]: columns [1, px', ly, px'^2, px' ly, ly^2]
        # in local pixel coords px' = lane % TILE_W, ly = lane // TILE_W
        li = jax.lax.broadcasted_iota(jnp.int32, (REG_W, 8), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (REG_W, 8), 1)
        pxl = (li % TILE_W).astype(fdt)
        lyf = (li // TILE_W).astype(fdt)
        zB = jnp.zeros((REG_W, 8), fdt)
        oneB = zB + 1.0
        Bmat = zB
        for k, col in enumerate(
            (oneB, pxl, lyf, pxl * pxl, pxl * lyf, lyf * lyf)
        ):
            Bmat = Bmat + jnp.where(ci == k, col, zB)
        # sublane combiner C [24, 64]: rows 8i+s of R belong to instance i,
        # sublane s; bands select weights [1, 4s, 16s^2] per instance
        ri = jax.lax.broadcasted_iota(jnp.int32, (3 * _CHUNK, rows_per), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (3 * _CHUNK, rows_per), 1)
        inst = ri % _CHUNK
        band = ri // _CHUNK
        sf = (rj % REG_H).astype(fdt)
        wgt = jnp.where(
            band == 0, 1.0, jnp.where(band == 1, 4.0 * sf, 16.0 * sf * sf)
        )
        Cmat = jnp.where(rj // REG_H == inst, wgt, 0.0).astype(fdt)

        sub = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 128), 1)
        slabpos = sub * 16 + lane // 8
        lane_m8 = lane % 8
        zrow128 = jnp.zeros((_CHUNK, 128), fdt)
        sub8 = sub  # (8, 128) sublane index, for the cx/cy parking

        one = zero + 1.0

        def get(j):
            return lambda f: payload_ref[0, j, f]

        def phase1(j):
            gf = get(j)
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            opa = gf(L["opa"])
            mx = gf(L["mx"])
            my = gf(L["my"])
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = _fast_exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            return ag, G, mx, my

        def group_cond(st):
            g, state = st
            return (g * _CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            T_, act, gcpref = state
            tx0 = (tx * TILE_W).astype(fdt)
            ty0 = (ty * TILE_H).astype(fdt)
            cxb = zrow128
            cyb = zrow128
            for s in range(_CHUNK // _BPIPE):
                pre = [phase1(g * _CHUNK + s * _BPIPE + i)
                       for i in range(_BPIPE)]
                for i, (ag, G, mx, my) in enumerate(pre):
                    aT = ag * T_
                    ta = T_ - aT
                    live = jnp.where(ta >= T_EPS, one, zero)
                    w = aT * (act * live)
                    act = act * jnp.where(ag > 0.0, live, one)
                    T_i = T_
                    T_ = T_ - w
                    gcpref = gcpref + gc * w

                    inv1a = 1.0 / (1.0 - ag)
                    g_alpha = gc * T_i + inv1a * (base_inv + gcpref)
                    g_alpha = g_alpha * jnp.where(w > 0.0, one, zero)
                    Dp = g_alpha * G
                    ii = s * _BPIPE + i
                    scr_ref[pl.ds(REG_H * ii, REG_H), :] = Dp
                    cxb = jnp.where(sub8 == ii, mx - tx0, cxb)
                    cyb = jnp.where(sub8 == ii, my - ty0, cyb)
            state = (T_, act, gcpref)
            # local pixel-coordinate moments via two MXU dots.  HIGHEST
            # precision is required: Mosaic's default f32 dot rounds
            # operands to bf16, and the basis weights (up to 961) and Dp
            # values lose ~4e-3 relative EACH, amplified ~30x by the
            # binomial recombination — probed 8.8e-2 relative gradient
            # error at DEFAULT vs ~1e-6 at HIGHEST (probe_r4_bwd).
            blk = scr_ref[...]  # (64, 128) Dp rows
            R = jax.lax.dot_general(
                blk, Bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=jax.lax.Precision.HIGHEST,
            )  # (64, 8)
            CR = jax.lax.dot_general(
                Cmat, R, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=jax.lax.Precision.HIGHEST,
            )  # (24, 8): [S1; S4; S16] @ R
            U = CR[0:_CHUNK, :]
            V = CR[_CHUNK : 2 * _CHUNK, :]
            W2 = CR[2 * _CHUNK : 3 * _CHUNK, :]
            S0 = U[:, 0:1]
            Sx = U[:, 1:2]
            Sy = V[:, 0:1] + U[:, 2:3]
            Sxx = U[:, 3:4]
            Sxy = V[:, 1:2] + U[:, 4:5]
            Syy = W2[:, 0:1] + 2.0 * V[:, 2:3] + U[:, 5:6]
            cx = cxb[:, 0:1]
            cy = cyb[:, 0:1]
            Ms = (
                S0,
                cx * S0 - Sx,
                cy * S0 - Sy,
                cx * (cx * S0 - 2.0 * Sx) + Sxx,
                cx * cy * S0 - cx * Sy - cy * Sx + Sxy,
                cy * (cy * S0 - 2.0 * Sy) + Syy,
            )
            rows128 = zrow128
            for k, Mk in enumerate(Ms):
                rows128 = rows128 + jnp.where(lane_m8 == k, Mk, zrow128)
            off = g * _CHUNK
            for i in range(_CHUNK):
                gid = idx_ref[off + i]
                base = pl.multiple_of((gid // 128) * 8, 8)
                val = jnp.where(
                    slabpos == gid % 128,
                    jnp.broadcast_to(rows128[i : i + 1], (_CHUNK, 128)),
                    zrow128,
                )
                acc_ref[pl.ds(base, _CHUNK), :] = (
                    acc_ref[pl.ds(base, _CHUNK), :] + val
                )
            return (g + 1, state)

        init = (zero + 1.0, zero + 1.0, zero)
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

        last = pl.num_programs(0) * pl.num_programs(1) - 1

        @pl.when(t == last)
        def _emit():
            acc_out_ref[...] = acc_ref[...]

    return kernel


@functools.lru_cache(maxsize=None)
def _make_bwd_moment_rmw_kernel(PR: int, basis: bool = True,
                                grp: int = _CHUNK, reduced: bool = True):
    """Training-config backward with IN-KERNEL slot->Gaussian reduction.

    Same per-instance math and moment-scratch MXU combiner as
    _make_bwd_moment_kernel, but instead of writing per-slot moment rows
    for an XLA-side scatter (which serializes under Pallas-chain VMEM
    pinning, ROADMAP.md), each `grp`-instance group's moments land directly
    in a persistent [PR, 128] accumulator: gaussian g owns lanes
    8*(g%16)..+8 of row g//16, and the write is an (8,128) slab RMW at the
    8-aligned row base (g//128)*8 with the placement done by vector masks
    (the slab is 8 rows regardless of `grp`).  Instance ids come from the
    SMEM idx block (sentinel P rows carry zero moments, so their RMW adds
    zeros).  `grp` amortizes the while_loop + liveness-reduce overhead
    (~0.5 us per GROUP, probed round 2 with an empty-body kernel): at the
    bench point the kernel runs only ~62k real instances, so grp=8 paid
    ~64 ns/instance of pure loop overhead — ~2x the instance math.  See
    blend_train for probe numbers.

    `basis=True` (round-4 experiment, MEASURED SLOWER — see USE_BASIS_BWD):
    the per-instance phase stores ONE scratch row — the adjoint map
    Dp = g_alpha * G — instead of the six dx/dy-weighted maps.  The six
    central moments are recovered per group from six TILE-LOCAL
    pixel-coordinate moments of Dp via the binomial expansion with the
    instance's local center (cx, cy) = mean2d - tile origin:

        M0 = S0                M1 = cx S0 - Sx        M2 = cy S0 - Sy
        M3 = cx^2 S0 - 2 cx Sx + Sxx
        M4 = cx cy S0 - cx Sy - cy Sx + Sxy
        M5 = cy^2 S0 - 2 cy Sy + Syy

    where S* are moments of Dp in local pixel coords px' = lane % 32 in
    [0,32), py' = 4*sublane + lane//32 in [0,32).  The S* ride TWO small
    MXU dots per 8-instance group — R = Dp_block(64,128) @ B(128,8) with
    lane-basis columns [1, px', ly, px'^2, px' ly, ly^2] (ly = lane//32),
    then CR = C(24,64) @ R with sublane weights [1, 4s, 16s^2] stacked —
    and the binomial combination runs on (8,1) columns.  This deletes 5 of
    6 per-instance (8,128) scratch stores and both dx/dy product chains.
    Numerics: |dx| >= |cx| - 31 by construction (a tile is a candidate
    only if the support reaches it), so the expansion never cancels
    catastrophically; exact on CPU (tests/test_torch_fullstep_parity runs
    both flavors' shared math), ~2e-3 relative vs the direct kernel on
    v5e even at Precision.HIGHEST (the MXU's bf16-pass emulation times
    the binomial amplification; probe_r4_bwd).
    """
    L, NF = field_layout(False, False, True)
    if basis:
        return _make_bwd_moment_rmw_basis_kernel(PR, L)

    def kernel(counts_ref, bg_ref, idx_ref, payload_ref,
               outc_ref, outt_ref, gc_ref, gt_ref, acc_out_ref,
               scr_ref, acc_ref):
        fdt = payload_ref.dtype
        t = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        outt = outt_ref[:, :]
        gt = gt_ref[:, :]
        gc = gc_ref[:, :]
        outc = outc_ref[:, :]
        # loop-invariant part of d(loss)/d(alpha): with gcpref tracking
        # gc * prefix, g_alpha = gc*T_i + inv1a*(base_inv + gcpref)
        base_inv = -gt * outt - gc * outc

        @pl.when(t == 0)
        def _init():
            acc_ref[...] = jnp.zeros(acc_ref.shape, fdt)

        rows_per = grp * REG_H
        if not reduced:
            gi = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 0)
            ri = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 1)
            S = jnp.where(ri // REG_H == gi, 1.0, 0.0).astype(fdt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (grp, 128), 1)
        lane_m8 = lane % 8
        zrowg = jnp.zeros((grp, 128), fdt)
        # (8,128) slab geometry for the RMW (independent of group width):
        # gaussian g lives at slab (g//128)*8, flat position g%128 — ONE
        # compare places it (vs sublane==... & lanegroup==...)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slabpos = sub8 * 16 + lane8 // 8
        zslab = jnp.zeros((8, 128), fdt)

        one = zero + 1.0

        def get(j):
            return lambda f: payload_ref[0, j, f]

        def phase1(j):
            gf = get(j)
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            opa = gf(L["opa"])
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = _fast_exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            return ag, G, dx, dy

        def group_cond(st):
            g, state = st
            return (g * grp < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            T_, act, gcpref = state
            for s in range(grp // _BPIPE):
                pre = [phase1(g * grp + s * _BPIPE + i)
                       for i in range(_BPIPE)]
                for i, (ag, G, dx, dy) in enumerate(pre):
                    aT = ag * T_
                    ta = T_ - aT
                    live = jnp.where(ta >= T_EPS, one, zero)
                    w = aT * (act * live)
                    act = act * jnp.where(ag > 0.0, live, one)
                    T_i = T_
                    T_ = T_ - w
                    gcpref = gcpref + gc * w  # gc * inclusive ones prefix

                    inv1a = 1.0 / (1.0 - ag)
                    g_alpha = gc * T_i + inv1a * (base_inv + gcpref)
                    g_alpha = g_alpha * jnp.where(w > 0.0, one, zero)
                    Dp = g_alpha * G
                    e1 = Dp * dx
                    e2 = Dp * dy
                    # reduced: sublane-sum each moment map to ONE row in
                    # registers before storing (see the paired kernel)
                    for k, v in enumerate(
                        (Dp, e1, e2, e1 * dx, e1 * dy, e2 * dy)
                    ):
                        if reduced:
                            scr_ref[grp * k + s * _BPIPE + i, :] = jnp.sum(
                                v, axis=0
                            )
                        else:
                            scr_ref[
                                pl.ds(
                                    rows_per * k
                                    + REG_H * (s * _BPIPE + i),
                                    REG_H,
                                ),
                                :,
                            ] = v
            state = (T_, act, gcpref)
            # reduced: VPU lane-sum of per-instance rows; full: MXU
            # one-hot combiner.  Either way rowsg replicates the (grp,1)
            # sums across the 16 lane groups so the RMW only has to mask
            rowsg = zrowg
            for k in range(6):
                if reduced:
                    blk = scr_ref[pl.ds(grp * k, grp), :]
                    col = jnp.sum(blk, axis=1, keepdims=True)  # (grp, 1)
                else:
                    blk = scr_ref[pl.ds(rows_per * k, rows_per), :]
                    Ak = jax.lax.dot_general(
                        S, blk, (((1,), (0,)), ((), ())),
                        preferred_element_type=fdt,
                    )
                    col = jnp.sum(Ak, axis=1, keepdims=True)
                rowsg = rowsg + jnp.where(lane_m8 == k, col, zrowg)
            off = g * grp
            for i in range(grp):
                gid = idx_ref[off + i]
                base = pl.multiple_of((gid // 128) * 8, 8)
                val = jnp.where(
                    slabpos == gid % 128,
                    jnp.broadcast_to(rowsg[i : i + 1], (8, 128)),
                    zslab,
                )
                acc_ref[pl.ds(base, 8), :] = (
                    acc_ref[pl.ds(base, 8), :] + val
                )
            return (g + 1, state)

        init = (zero + 1.0, zero + 1.0, zero)
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

        last = pl.num_programs(0) * pl.num_programs(1) - 1

        @pl.when(t == last)
        def _emit():
            acc_out_ref[...] = acc_ref[...]

    return kernel


def _moments_to_dfields(M, fields):
    """Per-Gaussian moment rows [P1, 8] -> field gradients [P1, NF]."""
    ca, cb, cc, opa = fields[:, 2], fields[:, 3], fields[:, 4], fields[:, 5]
    M0, M1, M2 = M[:, 0], M[:, 1], M[:, 2]
    M3, M4, M5 = M[:, 3], M[:, 4], M[:, 5]
    z = jnp.zeros_like(M0)
    return jnp.stack(
        [
            -opa * (ca * M1 + cb * M2),
            -opa * (cc * M2 + cb * M1),
            -0.5 * opa * M3,
            -opa * M4,
            -0.5 * opa * M5,
            M0,
            z,
            z,
        ],
        axis=-1,
    )


@functools.lru_cache(maxsize=None)
def _make_fwd_train_paired(grp: int = _FWD_CHUNK, indirect: bool = False,
                           kp: int = 1024):
    """Training-config forward over a PAIR of adjacent tiles per program.

    See PAIRED_BLEND.  Payload block (2, K, NF); every output writes both
    tiles' (8,128) blocks; the loop runs to max(n_a, n_b) — slots past a
    tile's count are sentinel rows (zero fields -> alpha 0), so no mask is
    needed.  Outputs only col+finT: invd/allmap are identically zero in
    the training config, and each dropped output block is 8 (invd) + 32
    (allmap) KB of pure-zero DMA per program — block transfers of 8-lane
    rows move at ~2.5 ns/ROW (round-4 probe_r4_fwdcost: VMEM tile padding
    turns them into row-strided scatters), so zero traffic is not free.

    `indirect=True` (TRAIN_INDIRECT): no payload table at all — the whole
    [P1, NF] fields array rides one constant-index-map VMEM block and the
    per-tile index lists stream through SMEM; each instance pays one extra
    SMEM read (idx -> gid) but the step drops the XLA payload gather
    (~0.4 ms) AND the per-program payload block DMA (2x896 8-lane rows at
    ~2.5 ns/row ~= 4.5 us/program), which round-4 tracing showed dominate
    the kernel's cost at the bench point.
    """
    L, _ = field_layout(False, False, True)

    def kernel(counts_ref, bg_ref, *refs):
        if indirect:
            idx_ref, fields_ref, col_ref, t_ref = refs
        else:
            payload_ref, col_ref, t_ref = refs
        fdt = fields_ref.dtype if indirect else payload_ref.dtype
        ty = pl.program_id(0)
        tj = pl.program_id(1)
        ntx = pl.num_programs(1) * 2
        ta = ty * ntx + 2 * tj
        n = jnp.maximum(counts_ref[ta], counts_ref[ta + 1])
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        is_ = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 0)
        p = is_ * REG_W + il
        pxa = ((2 * tj) * TILE_W + p % TILE_W).astype(fdt)
        pxb = pxa + float(TILE_W)
        py = (ty * TILE_H + p // TILE_W).astype(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        one = zero + 1.0

        def phase1(q, j, px):
            if indirect:
                gid = idx_ref[q * kp + j]
                gf = lambda f: fields_ref[gid, f]
            else:
                gf = lambda f: payload_ref[q, j, f]
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, gf(L["opa"]) * _fast_exp(power))
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            return jnp.where(cand, alpha, zero)

        conserve = FWD_CONSERVE

        def group_cond(st):
            g, state = st
            acta = state[1]
            actb = state[3] if conserve else state[4]
            return (g * grp < n) & (
                (jnp.max(acta) > 0.5) | (jnp.max(actb) > 0.5)
            )

        def group_body(st):
            g, state = st
            if conserve:
                Ta, acta, Tb, actb = state
                accA = accB = None
            else:
                Ta, acta, accA, Tb, actb, accB = state
            for s in range(grp // _PPIPE):
                base = g * grp + s * _PPIPE
                pa = [phase1(0, base + i, pxa) for i in range(_PPIPE)]
                pb = [phase1(1, base + i, pxb) for i in range(_PPIPE)]
                wsA, wsB = [], []
                for agA, agB in zip(pa, pb):
                    aT = agA * Ta
                    rem = Ta - aT
                    liveA = jnp.where(rem >= T_EPS, one, zero)
                    wA = aT * (acta * liveA)
                    acta = acta * jnp.where(agA > 0.0, liveA, one)
                    Ta = Ta - wA
                    wsA.append(wA)
                    bT = agB * Tb
                    remb = Tb - bT
                    liveB = jnp.where(remb >= T_EPS, one, zero)
                    wB = bT * (actb * liveB)
                    actb = actb * jnp.where(agB > 0.0, liveB, one)
                    Tb = Tb - wB
                    wsB.append(wB)
                if not conserve:  # FWD_CONSERVE: col derives from 1 - T
                    accA = accA + sum(wsA)
                    accB = accB + sum(wsB)
            state = (
                (Ta, acta, Tb, actb) if conserve
                else (Ta, acta, accA, Tb, actb, accB)
            )
            return (g + 1, state)

        init = (
            (one, one, one, one) if conserve
            else (one, one, zero, one, one, zero)
        )
        _, fin = jax.lax.while_loop(
            group_cond, group_body, (jnp.int32(0), init)
        )
        if conserve:
            Ta, Tb = fin[0], fin[2]
            # conservation identity: every blend step moved exactly w from
            # T to the accumulator, so acc == 1 - T and
            # col = acc + T*bg = 1 - T*(1 - bg)
            col_ref[0:REG_H, :] = 1.0 - Ta * (1.0 - bg_ref[0])
            col_ref[REG_H : 2 * REG_H, :] = 1.0 - Tb * (1.0 - bg_ref[0])
        else:
            Ta, accA, Tb, accB = fin[0], fin[2], fin[3], fin[5]
            col_ref[0:REG_H, :] = accA + Ta * bg_ref[0]
            col_ref[REG_H : 2 * REG_H, :] = accB + Tb * bg_ref[0]
        t_ref[0:REG_H, :] = Ta
        t_ref[REG_H : 2 * REG_H, :] = Tb

    return kernel


@functools.lru_cache(maxsize=None)
def _make_bwd_moment_rmw_paired(PR: int, grp: int, indirect: bool = False,
                                reduced: bool = True, kp: int = 1024):
    """Paired-tile flavor of the direct moment-RMW backward (PAIRED_BLEND).

    Identical per-instance math; two tiles' chains interleave per group,
    each tile keeps its own scratch half / combiner / slab RMWs into the
    SHARED per-program accumulator.

    DMA diet (round 4): takes gc and the PRECOMPUTED base_inv =
    -gt*finT - gc*outc image (an elementwise op that fuses into the
    cotangent producers outside) instead of the four outc/outt/gc/gt
    images — two fewer 8-KB image blocks per program, and block DMA of
    image tiles is the grid-step cost (probe_r4_fwdcost).

    `indirect=True`: fields load via the SMEM gid (already read for the
    slab RMW) from one constant-index-map [P1, NF] VMEM block — no
    [2, K, NF] payload block per program (see _make_fwd_train_paired).
    """
    L, NF = field_layout(False, False, True)

    def kernel(counts_ref, bg_ref, idx_ref, fp_ref,
               gc_ref, binv_ref, acc_out_ref, scr_ref, acc_ref):
        # fp_ref: [2, K, NF] payload block, or [P1, NF] fields (indirect)
        fdt = fp_ref.dtype
        ty = pl.program_id(0)
        tj = pl.program_id(1)
        ntx = pl.num_programs(1) * 2
        t = ty * pl.num_programs(1) + tj
        ta = ty * ntx + 2 * tj
        n = jnp.maximum(counts_ref[ta], counts_ref[ta + 1])
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        is_ = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 0)
        p = is_ * REG_W + il
        pxa = ((2 * tj) * TILE_W + p % TILE_W).astype(fdt)
        pxb = pxa + float(TILE_W)
        py = (ty * TILE_H + p // TILE_W).astype(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        one = zero + 1.0

        # per-tile image registers (blocks carry both tiles stacked)
        gcA = gc_ref[0:REG_H, :]
        gcB = gc_ref[REG_H : 2 * REG_H, :]
        base_invA = binv_ref[0:REG_H, :]
        base_invB = binv_ref[REG_H : 2 * REG_H, :]

        @pl.when(t == 0)
        def _init():
            acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

        rows_per = grp * REG_H
        half = 6 * grp if reduced else 6 * rows_per  # scratch rows per tile
        if not reduced:
            gi = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 0)
            ri = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 1)
            S = jnp.where(ri // REG_H == gi, 1.0, 0.0).astype(fdt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (grp, 128), 1)
        lane_m8 = lane % 8
        zrowg = jnp.zeros((grp, 128), fdt)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slabpos = sub8 * 16 + lane8 // 8
        zslab = jnp.zeros((8, 128), fdt)

        def phase1(q, j, px):
            if indirect:
                gid = idx_ref[q * kp + j]
                gf = lambda f: fp_ref[gid, f]
            else:
                gf = lambda f: fp_ref[q, j, f]
            ca = gf(L["ca"])
            cb = gf(L["cb"])
            cc = gf(L["cc"])
            opa = gf(L["opa"])
            dx = gf(L["mx"]) - px
            dy = gf(L["my"]) - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = _fast_exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            return ag, G, dx, dy

        def group_cond(st):
            g, (Ta, actA, prA, Tb, actB, prB) = st
            return (g * grp < n) & (
                (jnp.max(actA) > 0.5) | (jnp.max(actB) > 0.5)
            )

        def group_body(st):
            g, (Ta, actA, prA, Tb, actB, prB) = st
            for s in range(grp // _PPIPE):
                base = g * grp + s * _PPIPE
                pa = [phase1(0, base + i, pxa) for i in range(_PPIPE)]
                pb = [phase1(1, base + i, pxb) for i in range(_PPIPE)]
                for i in range(_PPIPE):
                    ii = s * _PPIPE + i
                    agA, GA, dxA, dyA = pa[i]
                    aT = agA * Ta
                    rem = Ta - aT
                    liveA = jnp.where(rem >= T_EPS, one, zero)
                    wA = aT * (actA * liveA)
                    actA = actA * jnp.where(agA > 0.0, liveA, one)
                    TiA = Ta
                    Ta = Ta - wA
                    prA = prA + gcA * wA
                    inv1a = 1.0 / (1.0 - agA)
                    gal = gcA * TiA + inv1a * (base_invA + prA)
                    gal = gal * jnp.where(wA > 0.0, one, zero)
                    DpA = gal * GA
                    e1 = DpA * dxA
                    e2 = DpA * dyA
                    # reduced mode: sublane-sum each (8,128) moment map
                    # to ONE row in registers before storing (full-map
                    # stores are 4 KB x 6/instance of VMEM traffic,
                    # ~46% of this kernel per probe_r4_bwdcost)
                    sdt = scr_ref.dtype
                    for k, v in enumerate(
                        (DpA, e1, e2, e1 * dxA, e1 * dyA, e2 * dyA)
                    ):
                        if reduced:
                            scr_ref[grp * k + ii, :] = jnp.sum(
                                v, axis=0
                            ).astype(sdt)
                        else:
                            scr_ref[
                                pl.ds(rows_per * k + REG_H * ii, REG_H), :
                            ] = v.astype(sdt)
                    agB, GB, dxB, dyB = pb[i]
                    bT = agB * Tb
                    remb = Tb - bT
                    liveB = jnp.where(remb >= T_EPS, one, zero)
                    wB = bT * (actB * liveB)
                    actB = actB * jnp.where(agB > 0.0, liveB, one)
                    TiB = Tb
                    Tb = Tb - wB
                    prB = prB + gcB * wB
                    inv1b = 1.0 / (1.0 - agB)
                    galb = gcB * TiB + inv1b * (base_invB + prB)
                    galb = galb * jnp.where(wB > 0.0, one, zero)
                    DpB = galb * GB
                    f1 = DpB * dxB
                    f2 = DpB * dyB
                    for k, v in enumerate(
                        (DpB, f1, f2, f1 * dxB, f1 * dyB, f2 * dyB)
                    ):
                        if reduced:
                            scr_ref[half + grp * k + ii, :] = jnp.sum(
                                v, axis=0
                            ).astype(sdt)
                        else:
                            scr_ref[
                                pl.ds(
                                    half + rows_per * k + REG_H * ii, REG_H
                                ),
                                :,
                            ] = v.astype(sdt)
            state = (Ta, actA, prA, Tb, actB, prB)
            off = g * grp
            for q in range(2):
                # reduced: VPU lane-sum of per-instance rows; full: MXU
                # one-hot combiner over the (rows_per, 128) map blocks
                # (bf16 scratch rides the MXU's native-bf16 input path
                # with f32 accumulation — S is an exact one-hot either way)
                rowsg = zrowg
                for k in range(6):
                    if reduced:
                        blk = scr_ref[pl.ds(q * half + grp * k, grp), :]
                        col = jnp.sum(
                            blk.astype(fdt), axis=1, keepdims=True
                        )
                    else:
                        blk = scr_ref[
                            pl.ds(q * half + rows_per * k, rows_per), :
                        ]
                        Ak = jax.lax.dot_general(
                            S.astype(blk.dtype), blk,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=fdt,
                        )
                        col = jnp.sum(Ak, axis=1, keepdims=True)
                    rowsg = rowsg + jnp.where(lane_m8 == k, col, zrowg)
                for i in range(grp):
                    gid = idx_ref[q * kp + off + i]
                    bs = pl.multiple_of((gid // 128) * 8, 8)
                    val = jnp.where(
                        slabpos == gid % 128,
                        jnp.broadcast_to(rowsg[i : i + 1], (8, 128)),
                        zslab,
                    )
                    acc_ref[pl.ds(bs, 8), :] = (
                        acc_ref[pl.ds(bs, 8), :]
                        + val.astype(acc_ref.dtype)
                    )
            return (g + 1, state)

        init = (one, one, zero, one, one, zero)
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

        last = pl.num_programs(0) * pl.num_programs(1) - 1

        @pl.when(t == last)
        def _emit():
            acc_out_ref[...] = acc_ref[...]

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def tile_blend(payload, counts, nty: int, ntx: int,
               geo: bool = True, invd: bool = True, ones: bool = False,
               bg=None):
    """Blend per-tile instance tables into padded images.

    payload: [T, K, NF]; counts: [T] int32; bg: [1] background (color chan).
    geo/invd gate the allmap / inverse-depth channels: the training loss
    only consumes the color channel, so gating them off removes ~40% of the
    per-instance kernel work (gated outputs return zeros).
    Outputs are TILED [T*REG_H, REG_W] (allmap [4, T*REG_H, REG_W]):
    row-block t holds tile t's TILE_H x TILE_W pixels in p = y*TILE_W + x
    order.  untile_image()/untile_allmap() restore spatial [Hp, Wp].
    """
    out, _ = _tile_blend_fwd(payload, counts, nty, ntx, geo, invd, ones, bg)
    return out


def _tile_blend_fwd(payload, counts, nty: int, ntx: int,
                    geo: bool = True, invd: bool = True, ones: bool = False,
                    bg=None):
    K = payload.shape[1]
    NF = payload.shape[2]
    dt = payload.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
            pl.BlockSpec((4, REG_H, REG_W), lambda i, j, c, b: (0, i * ntx + j, 0)),
        ],
    )
    col, invd_img, finT, am = pl.pallas_call(
        _make_fwd_kernel(geo, invd, ones),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((4, nty * ntx * REG_H, REG_W), dt),
        ],
        interpret=_interpret(),
    )(counts, bg, payload)
    out = (col, invd_img, finT, am)
    return out, (payload, counts, bg, out)


def _tile_blend_bwd(nty: int, ntx: int, geo: bool, invd: bool, ones: bool,
                    res, g):
    payload, counts, bg, out = res
    col, invd_img, finT, am = out
    gc, gd, gtt, gam = g
    K = payload.shape[1]
    NF = payload.shape[2]
    dt = payload.dtype
    T = payload.shape[0]
    img = lambda: pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0))
    am_spec = lambda: pl.BlockSpec(
        (4, REG_H, REG_W), lambda i, j, c, b: (0, i * ntx + j, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
            img(),
            img(),
            img(),
            am_spec(),
            img(),
            img(),
            img(),
            am_spec(),
        ],
        out_specs=[
            pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
    )
    (dpay,) = pl.pallas_call(
        _make_bwd_kernel(geo, invd, ones),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, K, NF), dt)],
        interpret=_interpret(),
    )(counts, bg, payload, col, invd_img, finT, am, gc, gd, gtt, gam)
    dbg = jnp.sum(gc * finT, dtype=dt).reshape(bg.shape)
    return (dpay, None, dbg)


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)


# ---------------------------------------------------------------------------
# training-config blend (the hot path): payload-table forward + moment
# backward with IN-KERNEL per-Gaussian RMW accumulation
# ---------------------------------------------------------------------------

_KP = 1024  # rank-1 SMEM block width (must divide Mosaic's (1024) tiling)


def _acc_rows(P1: int) -> int:
    """Accumulator rows for gids in [0, P1): row g//16, 8-row slabs."""
    return ((P1 - 1) // 128) * 8 + 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def blend_train(fields, gidx, idx_pad, counts, bg, nty: int, ntx: int):
    """tile_blend for the TRAINING channel config (ones color, no allmap /
    invdepth), with the backward's slot->Gaussian gradient reduction done
    INSIDE the kernel by masked read-modify-writes on a persistent VMEM
    accumulator.

    Motivation (probed, scripts/probe_s1d.py / probe_s1e.py): XLA's
    memory-space assignment pins every gather/scatter in a Pallas call's
    operand/result chain into VMEM and lowers it through a serial
    ~1.5 ns/element emitter — optimization_barrier does NOT break the
    chain, so neither the slot->Gaussian scatter-add (3.1 ms/step) nor any
    gather reformulation of it can run at DMA speed.  The escape: never
    hand XLA a per-slot table at all.  The backward keeps a [P1/16, 128]
    accumulator in VMEM across the whole tile grid (gaussian g -> row
    g//16, lanes 8*(g%16)..+8) and lands each instance's six moments with
    an (8,128) slab RMW at the 8-aligned base (g//128)*8 — the lane/
    sublane placement is pure VECTOR MASKING (legal for any g; only
    dynamic addressing carries alignment rules).  Probe s1e: bit-exact,
    ~2.2 ms/step cheaper than block store + scatter at the bench shape.
    The reference reduces with atomicAdd on raw pointers
    (backward.cu:453-675); this is the deterministic TPU equivalent.

    fields: [P1, NF] from stack_fields (ones=True layout, NF=8).
    gidx [T, K] / idx_pad [T, KP=1024] / counts: binning tables.  bg: [1].
    Returns the tile_blend 4-tuple (invd/allmap outputs are zeros).
    """
    out, _ = _blend_train_fwd(fields, gidx, idx_pad, counts, bg, nty, ntx)
    return out


def _blend_train_fwd(fields, gidx, idx_pad, counts, bg, nty: int, ntx: int):
    K = gidx.shape[1]
    NF = fields.shape[1]
    P1 = fields.shape[0]
    dt = fields.dtype
    paired = PAIRED_BLEND and ntx % 2 == 0
    indirect = TRAIN_INDIRECT and paired and idx_pad is not None
    if paired:
        # diet outputs: invd/allmap are identically zero in the training
        # config — dropping their blocks removes 40 KB of zero DMA per
        # program (8-lane-row block transfers cost ~2.5 ns/row, round 4)
        ntp = ntx // 2
        img2 = lambda: pl.BlockSpec(
            (2 * REG_H, REG_W), lambda i, j, c, b: (i * ntp + j, 0)
        )
        out_shape = [
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
        ]
        if indirect:
            payload = None
            KPi = idx_pad.shape[1]
            in_specs = [
                pl.BlockSpec(
                    (2 * KPi,), lambda i, j, c, b: (i * ntp + j,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((P1, NF), lambda i, j, c, b: (0, 0)),
            ]
            operands = (counts, bg, idx_pad.reshape(-1), fields)
        else:
            fields_b, idx_b = jax.lax.optimization_barrier((fields, gidx))
            payload = jax.lax.optimization_barrier(
                row_gather(fields_b, idx_b)
            )
            in_specs = [
                pl.BlockSpec(
                    (2, K, NF), lambda i, j, c, b: (i * ntp + j, 0, 0)
                ),
            ]
            operands = (counts, bg, payload)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntp),
            in_specs=in_specs,
            out_specs=[img2(), img2()],
        )
        col, finT = pl.pallas_call(
            _make_fwd_train_paired(
                indirect=indirect,
                kp=idx_pad.shape[1] if indirect else 1024,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(*operands)
        zimg = jnp.zeros((nty * ntx * REG_H, REG_W), dt)
        invd_img = zimg
        am = jnp.zeros((4, nty * ntx * REG_H, REG_W), dt)
    else:
        fields_b, idx_b = jax.lax.optimization_barrier((fields, gidx))
        payload = jax.lax.optimization_barrier(row_gather(fields_b, idx_b))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
                pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
                pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
                pl.BlockSpec((4, REG_H, REG_W), lambda i, j, c, b: (0, i * ntx + j, 0)),
            ],
        )
        col, invd_img, finT, am = pl.pallas_call(
            _make_fwd_kernel(False, False, True),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
                jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
                jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
                jax.ShapeDtypeStruct((4, nty * ntx * REG_H, REG_W), dt),
            ],
            interpret=_interpret(),
        )(counts, bg, payload)
    out = (col, invd_img, finT, am)
    return out, (fields, payload, idx_pad, counts, bg, col, finT)


def _blend_train_bwd(nty: int, ntx: int, res, g):
    fields, payload, idx_pad, counts, bg, col, finT = res
    gc, _gd, gtt, _gam = g  # invd/allmap outputs are zeros in this config
    P1, NF = fields.shape
    KP = idx_pad.shape[1] if idx_pad is not None else _KP
    K = KP if payload is None else payload.shape[1]
    PR = _acc_rows(P1)
    dt = fields.dtype
    img = lambda: pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0))
    basis = USE_BASIS_BWD
    # widest group that divides K (payload/idx reads stay in bounds for the
    # padded tail group); 32 amortizes the ~0.5 us/group loop overhead 4x
    # over the round-3 width of 8
    grp = next(g for g in (_BWD_GROUP, 16, 8) if K % g == 0 or g == 8)
    if basis:
        grp = _CHUNK
    n_scr = 1 if basis else 6  # Dp-only scratch vs six weighted maps
    if PAIRED_BLEND and not basis and ntx % 2 == 0:
        indirect = payload is None
        ntp = ntx // 2
        img2 = lambda: pl.BlockSpec(
            (2 * REG_H, REG_W), lambda i, j, c, b: (i * ntp + j, 0)
        )
        # DMA diet: base_inv = -gt*finT - gc*outc precomputed here (fuses
        # with the cotangent producers) — two image blocks per program
        # instead of four
        binv = -gtt * finT - gc * col
        fp_spec = (
            pl.BlockSpec((P1, NF), lambda i, j, c, b: (0, 0))
            if indirect
            else pl.BlockSpec((2, K, NF), lambda i, j, c, b: (i * ntp + j, 0, 0))
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntp),
            in_specs=[
                pl.BlockSpec(
                    (2 * KP,), lambda i, j, c, b: (i * ntp + j,),
                    memory_space=pltpu.SMEM,
                ),
                fp_spec,
                img2(), img2(),
            ],
            out_specs=[
                pl.BlockSpec((PR, 128), lambda i, j, c, b: (0, 0))
            ],
            scratch_shapes=[
                # reduced: one (1,128) row per moment-instance; full: six
                # (8,128) maps per instance.  BWD_SCR_BF16 halves this
                # buffer's store+reload traffic (see the flag).
                pltpu.VMEM(
                    (2 * 6 * grp, 128)
                    if BWD_SCR_REDUCED
                    else (2 * 6 * grp * REG_H, REG_W),
                    jnp.bfloat16 if _scr_bf16() else dt,
                ),
                pltpu.VMEM(
                    (PR, 128), jnp.bfloat16 if BWD_ACC_BF16 else dt
                ),
            ],
        )
        (acc,) = pl.pallas_call(
            _make_bwd_moment_rmw_paired(
                PR, grp, indirect=indirect, reduced=BWD_SCR_REDUCED, kp=KP
            ),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(
                (PR, 128), jnp.bfloat16 if BWD_ACC_BF16 else dt
            )],
            interpret=_interpret(),
        )(counts, bg, idx_pad.reshape(-1),
          fields if indirect else payload, gc, binv)
        M = acc.reshape(PR * 16, 8)[:P1].astype(dt)
        dfields = _moments_to_dfields(M, fields)
        dbg = jnp.sum(gc * finT, dtype=dt).reshape(bg.shape)
        return (dfields, None, None, None, dbg)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(
                    (KP,), lambda i, j, c, b: (i * ntx + j,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
                img(), img(), img(), img(),
            ],
            out_specs=[
                # the accumulator block is revisited by every grid step and
                # written back once at the last tile
                pl.BlockSpec((PR, 128), lambda i, j, c, b: (0, 0))
            ],
            scratch_shapes=[
                # basis flavor parks full (8,128) Dp maps; the direct
                # flavor's shape follows BWD_SCR_REDUCED
                pltpu.VMEM(
                    (grp * REG_H, REG_W)
                    if basis
                    else (
                        (6 * grp, 128)
                        if BWD_SCR_REDUCED
                        else (6 * grp * REG_H, REG_W)
                    ),
                    dt,
                ),
                pltpu.VMEM((PR, 128), dt),
            ],
        )
        kern = _make_bwd_moment_rmw_kernel(
            PR, basis, grp, reduced=BWD_SCR_REDUCED
        )
    (acc,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((PR, 128), dt)],
        interpret=_interpret(),
    )(counts, bg, idx_pad.reshape(-1), payload, col, finT, gc, gtt)
    M = acc.reshape(PR * 16, 8)[:P1]
    dfields = _moments_to_dfields(M, fields)
    dbg = jnp.sum(gc * finT, dtype=dt).reshape(bg.shape)
    return (dfields, None, None, None, dbg)


blend_train.defvjp(_blend_train_fwd, _blend_train_bwd)


# ---------------------------------------------------------------------------
# indirect variant: compact [P+1, NF] fields + in-kernel SMEM index blocks
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def tile_blend_indirect(fields, idx, counts, nty: int, ntx: int,
                        geo: bool = True, invd: bool = True,
                        ones: bool = False, bg=None):
    """tile_blend without the materialized [T, K, NF] payload table.

    fields: [P1, NF] compact rows from stack_fields (P1 a multiple of 8,
    row P = zeros sentinel); idx: [T, K] int32 per-tile instance lists with
    sentinel P at empty slots; counts: [T] int32.  The whole fields array
    stays resident in VMEM (constant index map) while the per-tile index
    block streams through SMEM, so each instance costs one extra SMEM
    scalar read instead of an HBM payload-gather pass.
    """
    out, _ = _tile_blend_ind_fwd(
        fields, idx, counts, nty, ntx, geo, invd, ones, bg
    )
    return out


def _ind_grid_spec(P1, NF, K, nty, ntx, extra_in, extra_out):
    # the index list rides SMEM as a rank-1 (K,) block over the flattened
    # [T*K] array: Mosaic rejects (1, K) SMEM blocks (last-two-dims rule).
    # CAUTION (probed round 5): rank-1 blocks must divide Mosaic's (1024)
    # tiling — K % 1024 == 0, NOT the 128 this note formerly claimed
    # (hardware lowering rejects e.g. a (896,) block).  Callers of the
    # indirect flavor use K = 1024 multiples.
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (K,), lambda i, j, c, b: (i * ntx + j,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((P1, NF), lambda i, j, c, b: (0, 0)),
        ]
        + extra_in,
        out_specs=extra_out,
    )


def _tile_blend_ind_fwd(fields, idx, counts, nty: int, ntx: int,
                        geo: bool, invd: bool, ones: bool, bg=None):
    P1, NF = fields.shape
    K = idx.shape[1]
    dt = fields.dtype
    img = lambda: pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0))
    grid_spec = _ind_grid_spec(
        P1, NF, K, nty, ntx, [],
        [img(), img(), img(),
         pl.BlockSpec((4, REG_H, REG_W), lambda i, j, c, b: (0, i * ntx + j, 0))],
    )
    col, invd_img, finT, am = pl.pallas_call(
        _make_fwd_kernel(geo, invd, ones, indirect=True),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((nty * ntx * REG_H, REG_W), dt),
            jax.ShapeDtypeStruct((4, nty * ntx * REG_H, REG_W), dt),
        ],
        interpret=_interpret(),
    )(counts, bg, idx.reshape(-1), fields)
    out = (col, invd_img, finT, am)
    return out, (fields, idx, counts, bg, out)


def _tile_blend_ind_bwd(nty: int, ntx: int, geo: bool, invd: bool, ones: bool,
                        res, g):
    fields, idx, counts, bg, out = res
    col, invd_img, finT, am = out
    gc, gd, gtt, gam = g
    P1, NF = fields.shape
    T, K = idx.shape
    dt = fields.dtype
    img = lambda: pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0))
    am_spec = lambda: pl.BlockSpec(
        (4, REG_H, REG_W), lambda i, j, c, b: (0, i * ntx + j, 0)
    )
    dbg = jnp.sum(gc * finT, dtype=dt).reshape(bg.shape)
    if USE_MOMENT_BWD and ones and not geo and not invd:
        # training config: moment-scratch backward (see the kernel docstring)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(
                    (K,), lambda i, j, c, b: (i * ntx + j,),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((P1, NF), lambda i, j, c, b: (0, 0)),
                img(), img(), img(), img(),
            ],
            out_specs=[
                pl.BlockSpec((1, K, 8), lambda i, j, c, b: (i * ntx + j, 0, 0))
            ],
            scratch_shapes=[pltpu.VMEM((6 * _CHUNK * REG_H, REG_W), dt)],
        )
        (mom,) = pl.pallas_call(
            _make_bwd_moment_kernel(indirect=True),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((T, K, 8), dt)],
            interpret=_interpret(),
        )(counts, bg, idx.reshape(-1), fields, col, finT, gc, gtt)
        M = jnp.zeros((P1, 8), dt).at[idx.reshape(-1)].add(
            mom.reshape(-1, 8), mode="drop"
        )
        return (_moments_to_dfields(M, fields), None, None, dbg)
    grid_spec = _ind_grid_spec(
        P1, NF, K, nty, ntx,
        [img(), img(), img(), am_spec(), img(), img(), img(), am_spec()],
        [pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0))],
    )
    (dpay,) = pl.pallas_call(
        _make_bwd_kernel(geo, invd, ones, indirect=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, K, NF), dt)],
        interpret=_interpret(),
    )(counts, bg, idx.reshape(-1), fields, col, invd_img, finT, am, gc, gd, gtt, gam)
    dfields = jnp.zeros((P1, NF), dt).at[idx.reshape(-1)].add(
        dpay.reshape(-1, NF), mode="drop"
    )
    return (dfields, None, None, dbg)


tile_blend_indirect.defvjp(_tile_blend_ind_fwd, _tile_blend_ind_bwd)


# ---------------------------------------------------------------------------
# tiled-layout <-> spatial-image conversion (pure XLA; autodiff transposes
# it back for the kernels' incoming gradients)
# ---------------------------------------------------------------------------


def untile_image(x: jnp.ndarray, nty: int, ntx: int) -> jnp.ndarray:
    """[T*REG_H, REG_W] tiled kernel output -> spatial [nty*TILE_H, ntx*TILE_W].

    Row-block t is tile t's pixels in p = y*TILE_W + x order, so the (8,128)
    block reinterprets directly as (TILE_H, TILE_W); one transpose
    interleaves tiles into scanline order.
    """
    return (
        x.reshape(nty, ntx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(nty * TILE_H, ntx * TILE_W)
    )


def untile_allmap(x: jnp.ndarray, nty: int, ntx: int) -> jnp.ndarray:
    """[4, T*REG_H, REG_W] -> [4, nty*TILE_H, ntx*TILE_W]."""
    return (
        x.reshape(4, nty, ntx, TILE_H, TILE_W)
        .transpose(0, 1, 3, 2, 4)
        .reshape(4, nty * TILE_H, ntx * TILE_W)
    )

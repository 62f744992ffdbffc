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

from .binning import TILE_H, TILE_W, Binning
from .projection import Preprocessed
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

def field_layout(geo: bool, invd: bool, ones: bool):
    """Payload lane layout for a channel configuration.

    The training path (ones color, no allmap/invdepth) needs only the 8
    geometry fields, halving payload-gather and gradient-table volume vs
    the full 14-field render layout.  NF is padded to a multiple of 8.
    """
    names = ["mx", "my", "ca", "cb", "cc", "opa", "ex", "ey"]
    if not ones:
        names.append("col")
    if invd:
        names.append("invd")
    if geo:
        names += ["am0", "am1", "am2", "am3"]
    nf = -(-len(names) // 8) * 8
    return {n: i for i, n in enumerate(names)}, nf

# instance group sizes: forward carries only (T, act, C...) tiles, so a wide
# group amortizes the liveness check (measured 6.0 -> 3.4 ms at 85k
# instances); backward parks 12 (CHUNK, 128) partial buffers, so it stays
# narrow to avoid register spills.  Both are multiples of the 8-sublane
# alignment required for the dpay slab store.
_FWD_CHUNK = 32
_CHUNK = 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


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
    """
    idx = binning.gather_idx  # [T, K]
    ok = binning.slot_valid
    L, nf = field_layout(geo, invd, ones)
    cols = [
        pre.mean2d[:, 0],
        pre.mean2d[:, 1],
        pre.conic[:, 0],
        pre.conic[:, 1],
        pre.conic[:, 2],
        pre.opacity,
        pre.extent[:, 0],
        pre.extent[:, 1],
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
    payload = fields[idx]  # [T, K, NF]
    return jnp.where(ok[..., None], payload, 0.0)


def _pixel_grids(dtype):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    # Mosaic only lowers integer iota; cast afterwards.
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    px = (tx * TILE_W + ix).astype(dtype)
    py = (ty * TILE_H + iy).astype(dtype)
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
def _make_fwd_kernel(geo: bool, invd: bool, ones: bool):
    chans = _channels(geo, invd)
    L, _ = field_layout(geo, invd, ones)
    nch = len(chans)

    def kernel(counts_ref, bg_ref, payload_ref, col_ref, invd_ref, t_ref, am_ref):
        fdt = payload_ref.dtype
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((TILE_H, TILE_W), fdt)

        def blend(j, st):
            # act is carried as f32 (Mosaic cannot carry i1 vectors in loops)
            T, act, accs = st
            act_b = act > 0.5
            dx = _f(payload_ref, j, L["mx"]) - px
            dy = _f(payload_ref, j, L["my"]) - py
            ca = _f(payload_ref, j, L["ca"])
            cb = _f(payload_ref, j, L["cb"])
            cc = _f(payload_ref, j, L["cc"])
            inside = (jnp.abs(dx) <= _f(payload_ref, j, L["ex"])) & (
                jnp.abs(dy) <= _f(payload_ref, j, L["ey"])
            )
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(
                ALPHA_MAX, _f(payload_ref, j, L["opa"]) * jnp.exp(power)
            )
            cand = inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
            test_T = jnp.where(cand, T * (1.0 - alpha), T)
            newly_done = cand & (test_T < T_EPS)
            contrib = cand & (~newly_done) & act_b
            w = jnp.where(contrib, alpha * T, zero)
            accs = tuple(
                acc
                + (
                    w
                    if (ones and ch == "col")
                    else _f(payload_ref, j, L[ch]) * w
                )
                for acc, ch in zip(accs, chans)
            )
            T = jnp.where(contrib, test_T, T)
            act = jnp.where(newly_done, zero, act)
            return (T, act, accs)

        def group_cond(st):
            g, state = st
            return (g * _FWD_CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            for i in range(_FWD_CHUNK):
                state = blend(g * _FWD_CHUNK + i, state)
            return (g + 1, state)

        init = (zero + 1.0, zero + 1.0, (zero,) * nch)
        _, (T, _, accs) = jax.lax.while_loop(
            group_cond, group_body, (jnp.int32(0), init)
        )
        by_ch = dict(zip(chans, accs))
        col_ref[:, :] = by_ch["col"] + T * bg_ref[0]
        invd_ref[:, :] = by_ch.get("invd", zero)
        t_ref[:, :] = T
        for i in range(4):
            am_ref[i, :, :] = by_ch.get(f"am{i}", zero)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel(geo: bool, invd: bool, ones: bool):
    chans = _channels(geo, invd)
    L, NF = field_layout(geo, invd, ones)

    def kernel(
        counts_ref,
        bg_ref,
        payload_ref,
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
        fdt = payload_ref.dtype
        n = _count(counts_ref)
        px, py = _pixel_grids(fdt)
        zero = jnp.zeros((TILE_H, TILE_W), fdt)
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
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, TILE_W), 0)
        zbuf = jnp.zeros((_CHUNK, TILE_W), fdt)

        def park(buf, i: int, v):
            partial = jnp.sum(v, axis=0, keepdims=True)  # (1, TILE_W)
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

        def blend(j, i, st):
            T, act, prefixes, bufs = st
            act_b = act > 0.5
            mxv = _f(payload_ref, j, L["mx"])
            myv = _f(payload_ref, j, L["my"])
            ca = _f(payload_ref, j, L["ca"])
            cb = _f(payload_ref, j, L["cb"])
            cc = _f(payload_ref, j, L["cc"])
            opa = _f(payload_ref, j, L["opa"])
            chvals = {
                ch: (1.0 if (ones and ch == "col") else _f(payload_ref, j, L[ch]))
                for ch in chans
            }
            dx = mxv - px
            dy = myv - py
            inside = (jnp.abs(dx) <= _f(payload_ref, j, L["ex"])) & (
                jnp.abs(dy) <= _f(payload_ref, j, L["ey"])
            )
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = jnp.exp(power)
            alpha_u = opa * G
            alpha = jnp.minimum(ALPHA_MAX, alpha_u)
            cand = inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
            test_T = jnp.where(cand, T * (1.0 - alpha), T)
            newly_done = cand & (test_T < T_EPS)
            contrib = cand & (~newly_done) & act_b
            w = jnp.where(contrib, alpha * T, zero)

            prefixes = tuple(
                A + chvals[ch] * w for A, ch in zip(prefixes, chans)
            )
            by_ch = dict(zip(chans, prefixes))

            inv1a = 1.0 / (1.0 - alpha)
            g_alpha = gt * (-outt * inv1a)
            for ch in chans:
                g_alpha += gch[ch] * (
                    chvals[ch] * T - (och[ch] - by_ch[ch]) * inv1a
                )
            g_alpha = jnp.where(contrib, g_alpha, zero)

            d_power = g_alpha * alpha_u
            vals = [
                d_power * (-ca * dx - cb * dy),
                d_power * (-cc * dy - cb * dx),
                d_power * (-0.5 * dx * dx),
                d_power * (-dx * dy),
                d_power * (-0.5 * dy * dy),
                g_alpha * G,
            ] + [gch[ch] * w for ch in grad_chans]
            bufs = tuple(park(buf, i, v) for buf, v in zip(bufs, vals))

            T = jnp.where(contrib, test_T, T)
            act = jnp.where(newly_done, zero, act)
            return (T, act, prefixes, bufs)

        def group_cond(st):
            g, state = st
            return (g * _CHUNK < n) & (jnp.max(state[1]) > 0.5)

        def group_body(st):
            g, state = st
            state = state[:-1] + ((zbuf,) * NG,)
            for i in range(_CHUNK):
                state = blend(g * _CHUNK + i, i, state)
            off = pl.multiple_of(g * _CHUNK, _CHUNK)
            dpay_ref[0, pl.ds(off, _CHUNK), :] = finish_group(state[-1])
            return (g + 1, state)

        init = (
            zero + 1.0,
            zero + 1.0,
            (zero,) * len(chans),
            (zbuf,) * NG,
        )
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))

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
    Returns (color [Hp,Wp], invdepth [Hp,Wp], final_T [Hp,Wp], allmap [4,Hp,Wp]).
    """
    out, _ = _tile_blend_fwd(payload, counts, nty, ntx, geo, invd, ones, bg)
    return out


def _tile_blend_fwd(payload, counts, nty: int, ntx: int,
                    geo: bool = True, invd: bool = True, ones: bool = False,
                    bg=None):
    K = payload.shape[1]
    NF = payload.shape[2]
    Hp, Wp = nty * TILE_H, ntx * TILE_W
    dt = payload.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((4, TILE_H, TILE_W), lambda i, j, c, b: (0, i, j)),
        ],
    )
    col, invd_img, finT, am = pl.pallas_call(
        _make_fwd_kernel(geo, invd, ones),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((4, Hp, Wp), dt),
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
    img = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j))
    am_spec = lambda: pl.BlockSpec(
        (4, TILE_H, TILE_W), lambda i, j, c, b: (0, i, j)
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

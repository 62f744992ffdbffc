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
Per-instance gradients are written to a dense [tiles, NF, K] table (no
atomics) and flow back to Gaussians through the autodiff transpose of the
payload gather (XLA's deterministic scatter-add).

Pixel tiles are 8 x 128 = one f32 vector register; payload rows are stored
field-major [tiles, NF, K] so a tile's instances stream contiguous in the
lane dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE_H, TILE_W, Binning
from .projection import Preprocessed
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

NF = 16  # payload fields (12 used, padded to a sublane multiple)
F_MX, F_MY, F_CA, F_CB, F_CC, F_OPA, F_EX, F_EY = 0, 1, 2, 3, 4, 5, 6, 7
F_COL, F_INVD, F_AM0 = 8, 9, 10  # allmap occupies 10..13

_CHUNK = 8  # instances processed between liveness checks


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def build_payload(
    pre: Preprocessed,
    color: jnp.ndarray,
    allmap: jnp.ndarray,
    binning: Binning,
) -> jnp.ndarray:
    """Gather per-Gaussian fields into the [T, NF, K] per-tile table.

    Pure jnp: its autodiff transpose is exactly the deterministic
    segment-sum of per-instance gradients back to Gaussians.
    """
    idx = binning.gather_idx  # [T, K]
    ok = binning.slot_valid
    fields = jnp.stack(
        [
            pre.mean2d[:, 0],
            pre.mean2d[:, 1],
            pre.conic[:, 0],
            pre.conic[:, 1],
            pre.conic[:, 2],
            pre.opacity,
            pre.extent[:, 0],
            pre.extent[:, 1],
            color,
            1.0 / pre.depth,
            allmap[:, 0],
            allmap[:, 1],
            allmap[:, 2],
            allmap[:, 3],
            jnp.zeros_like(color),
            jnp.zeros_like(color),
        ],
        axis=0,
    )  # [NF, P]
    payload = fields[:, idx]  # [NF, T, K]
    payload = jnp.where(ok[None], payload, 0.0)
    return payload.transpose(1, 0, 2)  # [T, NF, K]


def _f(payload_ref, f, j):
    """(1,1) view of payload field f, instance j — broadcasts over the tile."""
    return payload_ref[0, f, pl.ds(j, 1)].reshape(1, 1)


def _pixel_grids(dtype):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    px = (tx * TILE_W).astype(dtype) + jax.lax.broadcasted_iota(
        dtype, (TILE_H, TILE_W), 1
    )
    py = (ty * TILE_H).astype(dtype) + jax.lax.broadcasted_iota(
        dtype, (TILE_H, TILE_W), 0
    )
    return px, py


def _count(counts_ref):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    ntx = pl.num_programs(1)
    return counts_ref[ty * ntx + tx]


def _fwd_kernel(counts_ref, bg_ref, payload_ref, col_ref, invd_ref, t_ref, am_ref):
    fdt = payload_ref.dtype
    n = _count(counts_ref)
    px, py = _pixel_grids(fdt)
    zero = jnp.zeros((TILE_H, TILE_W), fdt)

    def blend(j, st):
        T, act, C, D, A0, A1, A2, A3 = st
        mx = _f(payload_ref, F_MX, j)
        my = _f(payload_ref, F_MY, j)
        ca = _f(payload_ref, F_CA, j)
        cb = _f(payload_ref, F_CB, j)
        cc = _f(payload_ref, F_CC, j)
        opa = _f(payload_ref, F_OPA, j)
        ex = _f(payload_ref, F_EX, j)
        ey = _f(payload_ref, F_EY, j)
        dx = mx - px
        dy = my - py
        inside = (jnp.abs(dx) <= ex) & (jnp.abs(dy) <= ey)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
        cand = inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
        test_T = jnp.where(cand, T * (1.0 - alpha), T)
        newly_done = cand & (test_T < T_EPS)
        contrib = cand & (~newly_done) & act
        w = jnp.where(contrib, alpha * T, zero)
        C = C + _f(payload_ref, F_COL, j) * w
        D = D + _f(payload_ref, F_INVD, j) * w
        A0 = A0 + _f(payload_ref, F_AM0, j) * w
        A1 = A1 + _f(payload_ref, F_AM0 + 1, j) * w
        A2 = A2 + _f(payload_ref, F_AM0 + 2, j) * w
        A3 = A3 + _f(payload_ref, F_AM0 + 3, j) * w
        T = jnp.where(contrib, test_T, T)
        act = act & (~newly_done)
        return (T, act, C, D, A0, A1, A2, A3)

    def chunk_cond(st):
        j0, state = st
        return (j0 < n) & jnp.any(state[1])

    def chunk_body(st):
        j0, state = st
        for i in range(_CHUNK):
            state = blend(j0 + i, state)
        return (j0 + _CHUNK, state)

    init = (zero + 1.0, zero < 1.0, zero, zero, zero, zero, zero, zero)
    _, (T, _, C, D, A0, A1, A2, A3) = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), init)
    )
    col_ref[:, :] = C + T * bg_ref[0]
    invd_ref[:, :] = D
    t_ref[:, :] = T
    am_ref[0, :, :] = A0
    am_ref[1, :, :] = A1
    am_ref[2, :, :] = A2
    am_ref[3, :, :] = A3


def _bwd_kernel(
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

    outc = outc_ref[:, :]
    outd = outd_ref[:, :]
    outt = outt_ref[:, :]
    gc = gc_ref[:, :]
    gd = gd_ref[:, :]
    gt = gt_ref[:, :]
    ga0 = gam_ref[0, :, :]
    ga1 = gam_ref[1, :, :]
    ga2 = gam_ref[2, :, :]
    ga3 = gam_ref[3, :, :]
    oa0 = outam_ref[0, :, :]
    oa1 = outam_ref[1, :, :]
    oa2 = outam_ref[2, :, :]
    oa3 = outam_ref[3, :, :]

    def blend(j, st):
        T, act, Ac, Ad, A0, A1, A2, A3 = st
        mx = _f(payload_ref, F_MX, j)
        my = _f(payload_ref, F_MY, j)
        ca = _f(payload_ref, F_CA, j)
        cb = _f(payload_ref, F_CB, j)
        cc = _f(payload_ref, F_CC, j)
        opa = _f(payload_ref, F_OPA, j)
        ex = _f(payload_ref, F_EX, j)
        ey = _f(payload_ref, F_EY, j)
        col = _f(payload_ref, F_COL, j)
        ivd = _f(payload_ref, F_INVD, j)
        am0 = _f(payload_ref, F_AM0, j)
        am1 = _f(payload_ref, F_AM0 + 1, j)
        am2 = _f(payload_ref, F_AM0 + 2, j)
        am3 = _f(payload_ref, F_AM0 + 3, j)
        dx = mx - px
        dy = my - py
        inside = (jnp.abs(dx) <= ex) & (jnp.abs(dy) <= ey)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(power)
        alpha_u = opa * G
        alpha = jnp.minimum(ALPHA_MAX, alpha_u)
        cand = inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
        test_T = jnp.where(cand, T * (1.0 - alpha), T)
        newly_done = cand & (test_T < T_EPS)
        contrib = cand & (~newly_done) & act
        w = jnp.where(contrib, alpha * T, zero)

        # prefix accumulators (including current instance)
        Ac = Ac + col * w
        Ad = Ad + ivd * w
        A0 = A0 + am0 * w
        A1 = A1 + am1 * w
        A2 = A2 + am2 * w
        A3 = A3 + am3 * w

        inv1a = 1.0 / (1.0 - alpha)
        g_alpha = gc * (col * T - (outc - Ac) * inv1a)
        g_alpha += gd * (ivd * T - (outd - Ad) * inv1a)
        g_alpha += ga0 * (am0 * T - (oa0 - A0) * inv1a)
        g_alpha += ga1 * (am1 * T - (oa1 - A1) * inv1a)
        g_alpha += ga2 * (am2 * T - (oa2 - A2) * inv1a)
        g_alpha += ga3 * (am3 * T - (oa3 - A3) * inv1a)
        g_alpha += gt * (-outt * inv1a)
        g_alpha = jnp.where(contrib, g_alpha, zero)

        d_power = g_alpha * alpha_u
        for f, v in (
            (F_MX, d_power * (-ca * dx - cb * dy)),
            (F_MY, d_power * (-cc * dy - cb * dx)),
            (F_CA, d_power * (-0.5 * dx * dx)),
            (F_CB, d_power * (-dx * dy)),
            (F_CC, d_power * (-0.5 * dy * dy)),
            (F_OPA, g_alpha * G),
            (F_COL, gc * w),
            (F_INVD, gd * w),
            (F_AM0, ga0 * w),
            (F_AM0 + 1, ga1 * w),
            (F_AM0 + 2, ga2 * w),
            (F_AM0 + 3, ga3 * w),
        ):
            dpay_ref[0, f, pl.ds(j, 1)] = jnp.sum(v).reshape(1)

        T = jnp.where(contrib, test_T, T)
        act = act & (~newly_done)
        return (T, act, Ac, Ad, A0, A1, A2, A3)

    def chunk_cond(st):
        j0, state = st
        return (j0 < n) & jnp.any(state[1])

    def chunk_body(st):
        j0, state = st
        for i in range(_CHUNK):
            state = blend(j0 + i, state)
        return (j0 + _CHUNK, state)

    init = (zero + 1.0, zero < 1.0, zero, zero, zero, zero, zero, zero)
    jax.lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), init))


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _grids(nty, ntx, counts, payload):
    K = payload.shape[-1]
    Hp, Wp = nty * TILE_H, ntx * TILE_W
    return K, Hp, Wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tile_blend(payload, counts, nty: int, ntx: int, bg=None):
    """Blend per-tile instance tables into padded images.

    payload: [T, NF, K]; counts: [T] int32; bg: [1] background (color chan).
    Returns (color [Hp,Wp], invdepth [Hp,Wp], final_T [Hp,Wp], allmap [4,Hp,Wp]).
    """
    out, _ = _tile_blend_fwd(payload, counts, nty, ntx, bg)
    return out


def _tile_blend_fwd(payload, counts, nty: int, ntx: int, bg):
    K, Hp, Wp = _grids(nty, ntx, counts, payload)
    dt = payload.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, NF, K), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j)),
            pl.BlockSpec((4, TILE_H, TILE_W), lambda i, j, c, b: (0, i, j)),
        ],
    )
    col, invd, finT, am = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((Hp, Wp), dt),
            jax.ShapeDtypeStruct((4, Hp, Wp), dt),
        ],
        interpret=_interpret(),
    )(counts, bg, payload)
    out = (col, invd, finT, am)
    return out, (payload, counts, bg, out)


def _tile_blend_bwd(nty: int, ntx: int, res, g):
    payload, counts, bg, out = res
    col, invd, finT, am = out
    gc, gd, gtt, gam = g
    K, Hp, Wp = _grids(nty, ntx, counts, payload)
    dt = payload.dtype
    T = payload.shape[0]
    img = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda i, j, c, b: (i, j))
    am_spec = lambda: pl.BlockSpec((4, TILE_H, TILE_W), lambda i, j, c, b: (0, i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, NF, K), lambda i, j, c, b: (i * ntx + j, 0, 0)),
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
            pl.BlockSpec((1, NF, K), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
    )
    (dpay,) = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, NF, K), dt)],
        interpret=_interpret(),
    )(counts, bg, payload, col, invd, finT, am, gc, gd, gtt, gam)
    dbg = jnp.sum(gc * finT, dtype=dt).reshape(bg.shape)
    return (dpay, None, dbg)


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)

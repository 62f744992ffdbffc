"""Fully-fused Pallas SSIM (TPU equivalent of submodules/fused-ssim).

The reference fuses the whole SSIM chain (2x separable 11-tap blur of five
moment maps + the SSIM map + the hand-derived input gradient) into two CUDA
kernels (fused-ssim/ssim.cu:187-366) because the eager 6-conv chain is
memory-bound.  The XLA banded-matmul formulation (ops/ssim.py) already rides
the MXU, but still pays 4 fusion round-trips through HBM per train step
(~0.65 ms at 512^2).  This module collapses each direction of the chain into
ONE Pallas kernel:

  forward : pad -> [per 128-row tile] products -> col-blur (band matmul on
            the MXU) -> row-blur -> SSIM map -> masked partial sums into a
            persistent (8, Wp) accumulator block; XLA reduces 8*Wp floats.
  backward: recompute moments on a double-halo tile, form the five
            d(ssim)/d(moment) maps, apply the ADJOINT blur (same band
            matrices, symmetric window) and combine with the elementwise
            chain factors -> dimg1, dimg2 tiles, written disjointly.

Border semantics are exact: images are zero-padded 16 rows top/bottom (so
every tile, including the first/last, has a real 8-row halo) and the band
matrices carry zeros outside the true [0,W) band, reproducing 'same'
zero-padding to the bit.  Pad rows/cols are masked out of the mean and of
the gradient partials, so the adjoint equals the true transpose including
border truncation.

Both kernels keep the full (padded) images VMEM-resident plus one [Wp,Wp]
row-band matrix; ssim() in ops/ssim.py gates on a VMEM estimate and falls
back to the banded-matmul version for very wide images (Replica-size).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ssim import C1, C2, _band_matrix, gaussian_window

_RB = 128  # rows per grid tile (multiple of 8; bounds per-tile VMEM values)
_HALO = 8  # blur halo rounded up to the f32 sublane alignment (>= 5)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=None)
def _col_band(rows: int, cols: int, window_size: int) -> np.ndarray:
    """[rows, cols] band matrix B[r, c] = w[c - _HALO - r + half]: maps a
    halo'd slab (row c = output row r at c == r + _HALO) to blurred rows."""
    w = gaussian_window(window_size)
    half = window_size // 2
    B = np.zeros((rows, cols), np.float32)
    for r in range(rows):
        for k, wk in enumerate(w):
            c = r + _HALO + (k - half)
            if 0 <= c < cols:
                B[r, c] = wk
    return B


@functools.lru_cache(maxsize=None)
def _row_band_padded(W: int, Wp: int, window_size: int) -> np.ndarray:
    B = np.zeros((Wp, Wp), np.float32)
    B[:W, :W] = _band_matrix(W, window_size)
    return B


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b):
    # Hand-rolled 3-pass bf16 f32 emulation (~22 mantissa bits), the moral
    # equivalent of Precision.HIGH — which Mosaic's dot lowering does not
    # support (only DEFAULT/HIGHEST); HIGHEST's 6 passes measured 0.33 ms
    # per value+grad at 512^2 vs the matmul path's 0.235 (probe_ssim_tpu).
    # hi*hi + hi*lo + lo*hi covers every product term above 2^-24 relative;
    # indistinguishable from full f32 for 11-tap blurs of [0,1] images
    # (parity tests hold at 2e-5 vs torch f64, same as ops/ssim.py HIGH).
    ah, al = _split(a)
    bh, bl = _split(b)
    f = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _moments(s1, s2, col_m, bx):
    """Five blurred moment maps of a slab pair via two band matmuls each."""
    maps = (s1, s2, s1 * s1, s2 * s2, s1 * s2)
    return tuple(_dot(_dot(col_m, m), bx) for m in maps)


def _fwd_kernel(img1_ref, img2_ref, fy_ref, bx_ref, out_ref, *, H, W, G):
    i = pl.program_id(0)
    base = pl.multiple_of(i * _RB + _HALO, 8)
    s1 = img1_ref[pl.ds(base, _RB + 2 * _HALO), :]
    s2 = img2_ref[pl.ds(base, _RB + 2 * _HALO), :]
    mu1, mu2, e11, e22, e12 = _moments(s1, s2, fy_ref[:], bx_ref[:])

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    ssim_map = ((2.0 * mu12 + C1) * (2.0 * (e12 - mu12) + C2)) / (
        (mu1_sq + mu2_sq + C1) * ((e11 - mu1_sq) + (e22 - mu2_sq) + C2)
    )

    Wp = ssim_map.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (_RB, Wp), 0) + i * _RB
    cols = jax.lax.broadcasted_iota(jnp.int32, (_RB, Wp), 1)
    masked = jnp.where((rows < H) & (cols < W), ssim_map, 0.0)

    acc = masked[0:8]
    for r in range(1, _RB // 8):  # static sublane-strided tree of adds
        acc = acc + masked[8 * r : 8 * r + 8]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _bwd_kernel(
    g_ref, img1_ref, img2_ref, my_ref, fy_ref, bx_ref, d1_ref, d2_ref,
    *, H, W, G,
):
    i = pl.program_id(0)
    base = pl.multiple_of(i * _RB, 8)
    s1 = img1_ref[pl.ds(base, _RB + 4 * _HALO), :]
    s2 = img2_ref[pl.ds(base, _RB + 4 * _HALO), :]
    bx = bx_ref[:]
    # moments on the halo'd row range [i*RB - HALO, i*RB + RB + HALO)
    mu1, mu2, e11, e22, e12 = _moments(s1, s2, my_ref[:], bx)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    A1 = 2.0 * mu12 + C1
    A2 = 2.0 * (e12 - mu12) + C2
    B1 = mu1_sq + mu2_sq + C1
    B2 = (e11 - mu1_sq) + (e22 - mu2_sq) + C2
    inv = 1.0 / (B1 * B2)
    ssim_v = A1 * A2 * inv
    dA1 = A2 * inv
    dA2 = A1 * inv
    dB1 = -ssim_v / B1
    dB2 = -ssim_v / B2

    # masked upstream scale: pad rows/cols contribute nothing to the mean
    HW = _RB + 2 * _HALO
    Wp = mu1.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (HW, Wp), 0) + (i * _RB - _HALO)
    cols = jax.lax.broadcasted_iota(jnp.int32, (HW, Wp), 1)
    g = jnp.where(
        (rows >= 0) & (rows < H) & (cols < W), g_ref[0, 0] / (H * W), 0.0
    )

    dmu1 = g * 2.0 * (mu2 * (dA1 - dA2) + mu1 * (dB1 - dB2))
    dmu2 = g * 2.0 * (mu1 * (dA1 - dA2) + mu2 * (dB1 - dB2))
    de = g * dB2          # d/d e11 == d/d e22
    de12 = g * 2.0 * dA2

    fy = fy_ref[:]
    adj = lambda u: _dot(fy, _dot(u, bx))  # symmetric window: adjoint = blur
    c1 = s1[2 * _HALO : 2 * _HALO + _RB, :]
    c2 = s2[2 * _HALO : 2 * _HALO + _RB, :]
    a_e12 = adj(de12)
    a_e = adj(de)
    d1_ref[:] = adj(dmu1) + 2.0 * c1 * a_e + c2 * a_e12
    d2_ref[:] = adj(dmu2) + 2.0 * c2 * a_e + c1 * a_e12


def _geometry(H: int, W: int):
    G = -(-H // _RB)
    Wp = max(128, -(-W // 128) * 128)
    return G, Wp


def _pad(img, G: int, Wp: int):
    H, W = img.shape
    return jnp.pad(
        img, ((2 * _HALO, G * _RB - H + 2 * _HALO), (0, Wp - W))
    )


def fused_vmem_bytes(H: int, W: int) -> int:
    """Rough persistent-VMEM footprint of the fused kernels, used by ssim()
    to gate the fallback for wide images.  The BACKWARD is the binding
    constraint: besides the two padded images and the row-band matrix it
    holds ~10 per-tile (RB + 2*HALO, Wp) f32 intermediates (5 moment maps,
    the d-maps and adjoint results) live at once — without that term the
    estimate under-counted ~2x near the gate and a ~900-1000 px frame
    could fail Mosaic VMEM allocation at compile time instead of falling
    back to the matmul path (round-3 advisor finding)."""
    G, Wp = _geometry(H, W)
    return (
        2 * (G * _RB + 4 * _HALO) * Wp * 4
        + Wp * Wp * 4
        + 10 * (_RB + 2 * _HALO) * Wp * 4
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ssim_fused(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Mean SSIM over a single-channel [H, W] pair, fully fused on-TPU."""
    val, _ = _ssim_fused_fwd(img1, img2, window_size)
    return val


def _ssim_fused_fwd(img1, img2, window_size):
    assert window_size // 2 <= _HALO, window_size
    H, W = img1.shape
    G, Wp = _geometry(H, W)
    fy = jnp.asarray(_col_band(_RB, _RB + 2 * _HALO, window_size))
    bx = jnp.asarray(_row_band_padded(W, Wp, window_size))
    sums = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, G=G),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Wp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, Wp), jnp.float32),
        interpret=_interpret(),
    )(_pad(img1, G, Wp), _pad(img2, G, Wp), fy, bx)
    return jnp.sum(sums) / (H * W), (img1, img2)


def _ssim_fused_bwd(window_size, res, gbar):
    img1, img2 = res
    H, W = img1.shape
    G, Wp = _geometry(H, W)
    my = jnp.asarray(
        _col_band(_RB + 2 * _HALO, _RB + 4 * _HALO, window_size)
    )
    fy = jnp.asarray(_col_band(_RB, _RB + 2 * _HALO, window_size))
    bx = jnp.asarray(_row_band_padded(W, Wp, window_size))
    d1, d2 = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, G=G),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_RB, Wp), lambda i: (i, 0)),
            pl.BlockSpec((_RB, Wp), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G * _RB, Wp), jnp.float32),
            jax.ShapeDtypeStruct((G * _RB, Wp), jnp.float32),
        ),
        interpret=_interpret(),
    )(
        jnp.reshape(gbar.astype(jnp.float32), (1, 1)),
        _pad(img1, G, Wp),
        _pad(img2, G, Wp),
        my,
        fy,
        bx,
    )
    return d1[:H, :W], d2[:H, :W]


ssim_fused.defvjp(_ssim_fused_fwd, _ssim_fused_bwd)

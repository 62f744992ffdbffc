"""SSIM for single-channel images (TPU-native fused-ssim equivalent).

The reference ships a fused CUDA SSIM (submodules/fused-ssim) because eager
PyTorch's 6-conv chain is slow.  The TPU-native formulation: the separable
11x11 'same' Gaussian blur is a BANDED MATMUL — blur(img) = A_H @ img @ A_W
with A[i, j] = w[j - i + 5] (zeros outside the band reproduce zero
same-padding exactly) — so the whole SSIM chain rides the otherwise-idle
MXU instead of doing 22 cross-lane shift relayouts per blur on the VPU
(measured ~10x faster at 512^2; shift-and-add lowers to one relayout per
tap).  Autodiff gives the backward for free: the band matrices are
symmetric, so gradient blurs are the same matmuls — exactly the identity
the reference's hand-written backward uses (fused-ssim/ssim.cu:288-366,
"convolve the upstream map with the same Gaussian").

Same 11x11 sigma-1.5 window, C1=0.01^2, C2=0.03^2, same-padding; semantics
of fused_ssim(..., "same") and utils/loss_utils.py:56-86.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01**2
C2 = 0.03**2


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int) -> np.ndarray:
    """[n, n] banded blur operator: B[i, j] = w[j - i + half] inside the
    band; zero outside == zero 'same'-padding at the borders."""
    w = gaussian_window(window_size)
    half = window_size // 2
    B = np.zeros((n, n), np.float32)
    for k, wk in enumerate(w):
        off = k - half
        idx = np.arange(max(0, -off), min(n, n - off))
        B[idx, idx + off] = wk
    return B


def _blur(img: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Separable 'same' Gaussian blur of [..., H, W] via banded matmuls."""
    h, w = img.shape[-2], img.shape[-1]
    By = jnp.asarray(_band_matrix(h, window_size))
    Bx = jnp.asarray(_band_matrix(w, window_size))
    # HIGH = 3-pass bf16 MXU passes (~22 mantissa bits): indistinguishable
    # from full f32 for 11-tap blurs of [0,1] images (parity tests hold at
    # 2e-5 vs torch f64) and half the cost of HIGHEST (6 passes) — the four
    # blur einsums were 1.29 ms/step of the r3 train step at HIGHEST.
    hi = jnp.einsum(
        "ih,...hw->...iw", By, img, precision=jax.lax.Precision.HIGH
    )
    return jnp.einsum(
        "...iw,wj->...ij", hi, Bx, precision=jax.lax.Precision.HIGH
    )


@functools.partial(jax.jit, static_argnames=("window_size", "method"))
def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    method: str | None = None,
) -> jnp.ndarray:
    """Mean SSIM over single-channel images.

    method: None (auto) | "fused" | "matmul".  Auto picks the fully-fused
    Pallas kernel pair (ssim_pallas.py: one dispatch forward, one backward,
    ~8x less HBM traffic than the 4-fusion XLA chain) whenever the inputs
    are a plain 2-D pair whose padded images + row-band matrix fit in VMEM
    (fused_vmem_bytes <= 10 MB; Replica-width frames and batched stacks take
    the matmul path below).  Both are exact 'same'-zero-padding SSIM and
    share the parity suite (tests/test_ssim.py).

    Matmul path: the five blurred moment maps (mu1, mu2, E[x^2], E[y^2],
    E[xy]) ride ONE batched matmul pair — a [..., 5, H, W] stack — instead
    of five separate blur calls: the MXU sees one big contraction per
    direction and the backward (transposed band matmuls over the same
    stack) batches the same way."""
    from .ssim_pallas import fused_vmem_bytes, ssim_fused

    if method not in (None, "fused", "matmul"):
        raise ValueError(f"ssim method {method!r}")
    fusable = img1.ndim == 2 and img1.dtype == jnp.float32
    if method == "fused" and not fusable:
        # never silently run a different kernel than the one explicitly
        # requested — a probe timing the "fused" path on bf16/batched inputs
        # would measure the matmul path instead (round-3 advisor finding)
        raise ValueError(
            "ssim(method='fused') requires a 2-D float32 image pair, got "
            f"ndim={img1.ndim} dtype={img1.dtype}; use method=None for "
            "auto-fallback"
        )
    if method != "matmul" and fusable:
        if method == "fused" or fused_vmem_bytes(*img1.shape) <= 10 * 2**20:
            return ssim_fused(img1, img2, window_size)
    stack = jnp.stack(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-3
    )
    mu1, mu2, e11, e22, e12 = jnp.moveaxis(
        _blur(stack, window_size), -3, 0
    )
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()

"""SSIM for single-channel images (TPU-native fused-ssim equivalent).

The reference ships a fused CUDA SSIM (submodules/fused-ssim) because eager
PyTorch's 6-conv chain is slow; under jit XLA fuses the separable convolution
chain into a handful of kernels, and autodiff provides the backward — this
IS the TPU-native equivalent of fused-ssim (same 11x11 sigma-1.5 window,
C1=0.01^2, C2=0.03^2, same-padding; semantics of fused_ssim(..., "same")
and utils/loss_utils.py:56-86).
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


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 'same' convolution over the last two axes of [..., H, W].

    Implemented as shift-and-add (k slice-adds per axis): single-channel
    batch-1 convolutions lower poorly on the TPU conv path (MXU sits idle),
    while padded slice-adds are pure fully-vectorized VPU work that XLA
    fuses into a handful of passes."""
    k = win.shape[0]
    pad = k // 2
    h, w = img.shape[-2], img.shape[-1]
    xp = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (0, 0)])
    out = jnp.zeros_like(img)
    for i in range(k):
        out = out + win[i] * jax.lax.slice_in_dim(xp, i, i + h, axis=-2)
    xp = jnp.pad(out, [(0, 0)] * (img.ndim - 2) + [(0, 0), (pad, pad)])
    out = jnp.zeros_like(img)
    for i in range(k):
        out = out + win[i] * jax.lax.slice_in_dim(xp, i, i + w, axis=-1)
    return out


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [..., H, W] single-channel images."""
    win = jnp.asarray(gaussian_window(window_size))
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()

"""SSIM vs the reference torch implementation (utils/loss_utils.py:56-86).

Mirrors the fused-ssim submodule's own test strategy
(submodules/fused-ssim/tests/test.py): value and input-gradient closeness
against an independent implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.ops.ssim import gaussian_window, ssim

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_ssim(a, b, window_size=11):
    win1d = torch.tensor(gaussian_window(window_size), dtype=torch.float64)
    window = (win1d[:, None] @ win1d[None, :]).reshape(1, 1, window_size, window_size)
    img1 = torch.tensor(a, dtype=torch.float64)[None, None]
    img2 = torch.tensor(b, dtype=torch.float64)[None, None]
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad)
    mu2 = F.conv2d(img2, window, padding=pad)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_matches_torch(rng):
    a = rng.uniform(size=(64, 96)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, size=a.shape), 0, 1).astype(np.float32)
    mine = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(a, b)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_ssim_identity_is_one(rng):
    a = rng.uniform(size=(40, 40)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999


@pytest.mark.parametrize("shape", [(64, 96), (200, 300), (136, 128)])
def test_fused_matches_matmul(rng, shape):
    """The Pallas-fused kernels and the XLA banded-matmul path are the same
    math; value and both input gradients must agree to float roundoff."""
    a = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=shape).astype(np.float32))
    # tolerances: the fused kernel's 3-pass bf16 dot emulation carries ~22
    # mantissa bits vs the CPU matmul path's full f32 (measured 2.5e-6
    # value / 2.5e-8 grad gaps); the shared f64-torch oracle tests pin both
    # flavors to the true answer at 2e-5
    vf = float(ssim(a, b, method="fused"))
    vm = float(ssim(a, b, method="matmul"))
    np.testing.assert_allclose(vf, vm, atol=1e-5)
    gf = jax.grad(lambda x: ssim(x, b, method="fused"))(a)
    gm = jax.grad(lambda x: ssim(x, b, method="matmul"))(a)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gm), atol=1e-6)
    hf = jax.grad(lambda y: ssim(a, y, method="fused"))(b)
    hm = jax.grad(lambda y: ssim(a, y, method="matmul"))(b)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hm), atol=1e-6)


def test_fused_gradient_matches_torch(rng):
    """Fused backward (hand-derived adjoint in ssim_pallas._bwd_kernel) vs
    torch f64 autodiff of the same 'same'-padded SSIM."""
    a = rng.uniform(size=(72, 60)).astype(np.float32)
    b = rng.uniform(size=(72, 60)).astype(np.float32)
    g_mine = np.asarray(
        jax.grad(lambda x: ssim(x, jnp.asarray(b), method="fused"))(
            jnp.asarray(a)
        )
    )
    win1d = torch.tensor(gaussian_window(11), dtype=torch.float64)
    window = (win1d[:, None] @ win1d[None, :]).reshape(1, 1, 11, 11)
    ta = torch.tensor(a, dtype=torch.float64, requires_grad=True)
    img1, img2 = ta[None, None], torch.tensor(b, dtype=torch.float64)[None, None]
    mu1 = F.conv2d(img1, window, padding=5)
    mu2 = F.conv2d(img2, window, padding=5)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=5) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=5) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=5) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    m.mean().backward()
    np.testing.assert_allclose(g_mine, ta.grad.numpy(), atol=2e-5)


def test_ssim_gradient_matches_torch(rng):
    a = rng.uniform(size=(32, 48)).astype(np.float32)
    b = rng.uniform(size=(32, 48)).astype(np.float32)
    g_mine = np.asarray(jax.grad(lambda x: ssim(x, jnp.asarray(b)))(jnp.asarray(a)))

    win1d = torch.tensor(gaussian_window(11), dtype=torch.float64)
    window = (win1d[:, None] @ win1d[None, :]).reshape(1, 1, 11, 11)
    ta = torch.tensor(a, dtype=torch.float64, requires_grad=True)
    tb = torch.tensor(b, dtype=torch.float64)
    img1, img2 = ta[None, None], tb[None, None]
    mu1 = F.conv2d(img1, window, padding=5)
    mu2 = F.conv2d(img2, window, padding=5)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=5) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=5) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=5) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    m.mean().backward()
    np.testing.assert_allclose(g_mine, ta.grad.numpy(), atol=2e-5)

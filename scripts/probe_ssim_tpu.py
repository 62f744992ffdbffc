#!/usr/bin/env python
"""Validate + time the fused Pallas SSIM on hardware vs the matmul path.

Times value+grad (the train-step usage) at 512^2 via a scanned chunk (the
probe rule: per-dispatch latency is ~1 ms on a contaminated process; scan
amortizes), parity-checks fused vs matmul on device, and prints per-call
milliseconds for both flavors.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from curve_gaussian_tpu.ops.ssim import ssim

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)
H = W = 512
a = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
b = jnp.asarray(
    np.clip(rng.uniform(size=(H, W)) + rng.normal(0, 0.1, size=(H, W)), 0, 1)
    .astype(np.float32)
)

REPS = 200


def chunk(method):
    @jax.jit
    def f(a, b):
        def body(c, _):
            v, g = jax.value_and_grad(
                lambda x: ssim(x, b, method=method)
            )(a + 1e-6 * c)
            return c + v + g[0, 0], None

        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=REPS)
        return out

    return f


for method in ("fused", "matmul"):
    f = chunk(method)
    t0 = time.time()
    v = float(f(a, b))
    print(f"{method}: compile+first {time.time()-t0:.1f}s (v {v:.4f})",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        float(f(a, b))
        times.append(time.time() - t0)
    per = min(times) / REPS * 1e3
    print(f"{method}: {per:.3f} ms per value+grad", flush=True)

# on-device parity
vf = float(ssim(a, b, method="fused"))
vm = float(ssim(a, b, method="matmul"))
gf = jax.grad(lambda x: ssim(x, b, method="fused"))(a)
gm = jax.grad(lambda x: ssim(x, b, method="matmul"))(a)
print(f"value fused {vf:.7f} matmul {vm:.7f} |d|={abs(vf-vm):.2e}", flush=True)
print(f"grad maxerr {float(jnp.abs(gf-gm).max()):.2e}", flush=True)

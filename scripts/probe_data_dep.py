#!/usr/bin/env python
"""Probe: is TPU gather/scatter runtime DATA-dependent?

Same gather/scatter HLO, different index data:
  a. uniform random ids in [0, P)
  b. the real binning's gather_idx (depth-sorted per tile, sentinel P in
     empty slots — out of bounds, clamped by XLA)
  c. random ids with the real slot_valid pattern of sentinels
  d. all-sentinel (worst clamp case)
  e. sorted ids (ascending)
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

from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops.projection import preprocess

H = W = 512
cams = synthetic.ring_cameras(4, H, W)
seed_pts = synthetic.grid_seed_points(15)
state_r = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
gsr = cs.gaussians(state_r)
pre = jax.jit(
    lambda: preprocess(
        gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cams[0],
        alive=gsr["alive"],
    )
)()
KCAP = 896
b = jax.block_until_ready(
    jax.jit(lambda: B.bin_gaussians(pre, H, W, capacity=KCAP))()
)
T, K = b.gather_idx.shape
P = pre.mean2d.shape[0]
print(f"T={T} K={K} P={P}, live slots={int(b.slot_valid.sum())}", flush=True)

rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
grads = jnp.asarray(rng.standard_normal((T, K, 8)), jnp.float32)

idx_a = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
idx_b = b.gather_idx
idx_c = jnp.where(b.slot_valid, idx_a, P)
idx_d = jnp.full((T, K), P, jnp.int32)
idx_e = jnp.sort(idx_a, axis=None).reshape(T, K)


@jax.jit
def g(fields, idx):
    return fields[idx]


@jax.jit
def s(grads, idx):
    return jnp.zeros((P, 8), jnp.float32).at[idx.reshape(-1)].add(
        grads.reshape(-1, 8), mode="drop"
    )


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:46s} {ms:8.3f} ms", flush=True)
    return ms


for name, idx in [("a uniform random", idx_a), ("b real binning idx", idx_b),
                  ("c random + real sentinels", idx_c),
                  ("d all-sentinel (oob)", idx_d), ("e sorted ids", idx_e)]:
    timeit(g, fields, idx, label=f"gather  {name}")
for name, idx in [("a uniform random", idx_a), ("b real binning idx", idx_b),
                  ("c random + real sentinels", idx_c),
                  ("d all-sentinel (drop)", idx_d), ("e sorted ids", idx_e)]:
    timeit(s, grads, idx, label=f"scatter {name}")

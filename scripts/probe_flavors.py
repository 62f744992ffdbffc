#!/usr/bin/env python
"""Probe: honest A/B of blend flavors at the worst-case bench point.

Times the full raster fwd+bwd (binning + payload/fields + blend + grads)
for (a) the table flavor (XLA [T,K,NF] payload gather feeding the Pallas
kernels) and (b) the indirect flavor (compact [P+1,NF] fields resident in
VMEM + per-tile SMEM index blocks) in the SAME process, so per-process
dispatch-latency contamination cancels.  CGT_COMPILER_OPTS (json) is
forwarded to every jit so flag fixes can be A/B'd too.

Context: the train-step trace shows the payload gather / grad scatter /
idx-table fusions lowered with S(1) (VMEM) outputs at ~17 ns/row serial
cost — ~3.2/3.1/1.6 ms per step (fusion.587/594/586) — while the same HLO
isolated runs at DMA speed (~0.02-0.04 ms).  The indirect flavor removes
the payload gather structurally.
"""
import json
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
from curve_gaussian_tpu.ops.rasterize_pallas import (
    build_payload,
    stack_fields,
    tile_blend,
    tile_blend_indirect,
    untile_image,
)

OPTS = json.loads(os.environ.get("CGT_COMPILER_OPTS", "null"))
print(f"compiler_options={OPTS}", flush=True)

H = W = 512
cams = synthetic.ring_cameras(4, H, W)
rng = np.random.default_rng(0)
gt0 = jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
seed_pts = synthetic.grid_seed_points(15)
state_r = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
gsr = cs.gaussians(state_r)
pre = jax.jit(
    lambda x, s, q, o, a: preprocess(x, s, q, o, cams[0], alive=a)
)(gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], gsr["alive"])
jax.block_until_ready(pre)
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)
bgr = jnp.zeros(1)


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{label:52s} {(time.time()-t0)/reps*1e3:8.3f} ms", flush=True)


def loss_table(m2, kcap):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=kcap)
    pl_ = build_payload(p, col, amz, b, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend(pl_, b.counts, nty, ntx, False, False, True, bgr)
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


def loss_ind(m2, kcap):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=kcap)
    f = stack_fields(p, col, amz, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend_indirect(
        f, b.gather_idx, b.counts, nty, ntx, False, False, True, bgr
    )
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


for kcap in (896, 1024):
    gt_ = jax.jit(lambda m2: jax.grad(loss_table)(m2, kcap),
                  compiler_options=OPTS)
    timeit(gt_, pre.mean2d, label=f"table  flavor grad, K={kcap}")
    gi_ = jax.jit(lambda m2: jax.grad(loss_ind)(m2, kcap),
                  compiler_options=OPTS)
    timeit(gi_, pre.mean2d, label=f"indirect flavor grad, K={kcap}")

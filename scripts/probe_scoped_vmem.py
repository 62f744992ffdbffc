#!/usr/bin/env python
"""Probe: does limiting XLA scoped-VMEM fix the slow in-step gathers?

The step's slow ops all read/write S(1) (scoped VMEM) buffers around the
Pallas custom calls.  Time the bench's raster-only grad under the current
XLA_FLAGS (set by the caller).
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

from curve_gaussian_tpu.config import PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_pallas import (
    build_payload, tile_blend, untile_image,
)

H = W = 512
cams = synthetic.ring_cameras(4, H, W)
rng = np.random.default_rng(0)
gt0 = jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
seed_pts = synthetic.grid_seed_points(15)
pipe_cfg = PipelineConfig()
state_r = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
gsr = cs.gaussians(state_r)
pre = jax.jit(
    lambda: preprocess(
        gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cams[0],
        alive=gsr["alive"],
    )
)()
jax.block_until_ready(pre)
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)
bgr = jnp.zeros(1)
KCAP = pipe_cfg.tile_capacity
print(f"XLA_FLAGS={os.environ.get('XLA_FLAGS','')}", flush=True)


def raster_loss(m2):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=KCAP)
    pl_ = build_payload(p, col, amz, b, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend(pl_, b.counts, nty, ntx, False, False, True, bgr)
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


import json

opts = json.loads(os.environ.get("CGT_COMPILER_OPTS", "null"))
print(f"compiler_options={opts}", flush=True)
g_f = jax.jit(jax.grad(raster_loss), compiler_options=opts)
t0 = time.time()
out = jax.block_until_ready(g_f(pre.mean2d))
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(60):
    out = g_f(pre.mean2d)
jax.block_until_ready(out)
print(f"raster grad: {(time.time()-t0)/60*1e3:.3f} ms", flush=True)

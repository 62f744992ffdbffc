#!/usr/bin/env python
"""Bisect the 13.5 ms raster-only fwd+bwd: which piece makes gathers slow?

Plain probes show the payload gather at 0.04 ms isolated, but the step
trace shows 3.2 ms for the identical HLO.  The bench's raster-only micro
reproduces the slowness WITHOUT lax.scan, so strip it down:

  t0  full raster grad (bin + payload + blend + bwd)         [bench: 13.5]
  t1  binning only (fwd, no grad)
  t2  payload gather only, binning precomputed as jit inputs (fwd)
  t3  payload + fwd kernel, binning precomputed (no grad)
  t4  payload + fwd kernel + grad, binning precomputed
  t5  full fwd (bin + payload + blend), no grad
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
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gt0 = jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
seed_pts = synthetic.grid_seed_points(15)
pipe_cfg = PipelineConfig()
state_r = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
gsr = cs.gaussians(state_r)
cam0 = cams[0]
pre = jax.jit(
    lambda: preprocess(
        gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cam0,
        alive=gsr["alive"],
    )
)()
jax.block_until_ready(pre)
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)
bgr = jnp.zeros(1)
KCAP = pipe_cfg.tile_capacity
print(f"device: {jax.devices()[0]}; tile_capacity {KCAP}", flush=True)


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:52s} {ms:8.3f} ms", flush=True)
    return ms


def raster_loss(m2):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=KCAP)
    pl_ = build_payload(p, col, amz, b, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend(pl_, b.counts, nty, ntx, False, False, True, bgr)
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


g_f = jax.jit(jax.grad(raster_loss))
timeit(g_f, pre.mean2d, label="t0 full raster grad (bench baseline)")

bin_f = jax.jit(lambda m2: B.bin_gaussians(
    pre._replace(mean2d=m2), H, W, capacity=KCAP))
timeit(bin_f, pre.mean2d, label="t1 binning only")

b_static = jax.block_until_ready(bin_f(pre.mean2d))


@jax.jit
def t2(m2, gidx, ok):
    p = pre._replace(mean2d=m2)
    b = b_static._replace(gather_idx=gidx, slot_valid=ok)
    return build_payload(p, col, amz, b, geo=False, invd=False, ones=True)


timeit(t2, pre.mean2d, b_static.gather_idx, b_static.slot_valid,
       label="t2 payload gather only (static binning)")


@jax.jit
def t3(m2, gidx, ok, counts):
    p = pre._replace(mean2d=m2)
    b = b_static._replace(gather_idx=gidx, slot_valid=ok)
    pl_ = build_payload(p, col, amz, b, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend(pl_, counts, nty, ntx, False, False, True, bgr)
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


timeit(t3, pre.mean2d, b_static.gather_idx, b_static.slot_valid,
       b_static.counts, label="t3 payload+blend fwd (static binning)")

t4 = jax.jit(jax.grad(
    lambda m2, gidx, ok, counts: t3.__wrapped__(m2, gidx, ok, counts)
))
timeit(t4, pre.mean2d, b_static.gather_idx, b_static.slot_valid,
       b_static.counts, label="t4 payload+blend grad (static binning)")

t5 = jax.jit(raster_loss)
timeit(t5, pre.mean2d, label="t5 full fwd only (bin+payload+blend)")

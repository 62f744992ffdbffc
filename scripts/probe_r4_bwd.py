#!/usr/bin/env python
"""A/B the round-4 moment-basis backward + binning emission fusion on TPU.

Measures the raster-only fwd+bwd micro (bin + payload + blend_train +
grads to preprocessed means) with USE_BASIS_BWD flipped, plus the full
train step, at the bench worst-case shape.  Fresh jit instances per flavor
(module flags are trace-time constants).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops import rasterize_pallas as RP
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_pallas import (
    blend_train,
    stack_fields,
    untile_image,
)

H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gts = [jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
       for _ in range(n_views)]
seed_pts = synthetic.grid_seed_points(15)
pipe_cfg = PipelineConfig()
opt_cfg = OptimizationConfig()
state_r = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
gsr = cs.gaussians(state_r)
cam0 = cams[0]
pre = jax.jit(
    lambda: preprocess(
        gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cam0,
        alive=gsr["alive"],
    )
)()
_ = float(np.asarray(pre.mean2d)[0, 0])  # sync (block_until_ready lies)
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)
bgr = jnp.zeros(1)
gt0 = gts[0]


def raster_loss(m2):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=pipe_cfg.tile_capacity)
    fl = stack_fields(p, col, amz, geo=False, invd=False, ones=True)
    c, _, _, _ = blend_train(
        fl, b.gather_idx, b.idx_pad, b.counts, bgr, nty, ntx
    )
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


def measure(tag):
    g_f = jax.jit(jax.grad(raster_loss))
    t0 = time.time()
    out = g_f(pre.mean2d)
    s = float(np.asarray(out)[0, 0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s (checksum {s:.3e})")
    reps = 40
    t0 = time.time()
    for _ in range(reps):
        out = g_f(pre.mean2d)
    s = float(np.asarray(out)[-1, -1])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{tag}: raster fwd+bwd {ms:.2f} ms -> {H*W/ms/1e3:.1f} Mpix/s")
    return np.asarray(out)


for basis in (True, False):
    RP.USE_BASIS_BWD = basis
    out = measure(f"basis={basis}")
    if basis:
        ref = out
    else:
        d = np.max(np.abs(out - ref))
        rel = d / (np.max(np.abs(ref)) + 1e-30)
        print(f"basis-vs-direct grad max|d| {d:.3e} (rel {rel:.3e})")

# full train step (scan chunk), both backward flavors
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
K = 50
bg = jnp.zeros(())

for basis in (True, False):
    RP.USE_BASIS_BWD = basis
    jax.clear_caches()
    state = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    ts = jax.device_put(T.init_train_state(state), jax.devices()[0])

    def chunk(ts):
        vi = jnp.arange(K, dtype=jnp.int32) % n_views
        return T.train_steps_scan(
            ts, (w2c[vi], proj[vi], ctr[vi]), gt_all[vi], bg, opt_cfg,
            pipe_cfg, use_mask=False, n_gaussians=12, cam_geom=geom,
        )

    t0 = time.time()
    ts, m = chunk(ts)
    print(f"basis={basis}: step compile+chunk {time.time()-t0:.1f}s "
          f"(loss {float(m['total'][-1]):.4f})")
    t0 = time.time()
    for i in range(4):
        ts, m = chunk(ts)
    loss = float(m["total"][-1])
    dt = time.time() - t0
    print(f"basis={basis}: full step {dt/200*1e3:.2f} ms -> "
          f"{200/dt:.1f} it/s, {200/dt*H*W/1e6:.1f} Mpix/s "
          f"(loss {loss:.4f})")

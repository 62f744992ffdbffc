#!/usr/bin/env python
"""Trace the DP (shard_map) batched-view train path vs the single-view scan.

The bench shows a ~400 ms fixed per-step cost in parallel_train_steps_scan
on a 1-device mesh (B=2: 351 ms/step, B=8: 408 ms/step — nearly flat in B)
vs 11.8 ms for the single-view train_steps_scan.  Capture profiler traces
of both and a timing split to find the fixed cost.
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

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.parallel import sharding as sh

H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gts = [jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32) for _ in range(n_views)]
seed_pts = synthetic.grid_seed_points(15)
opt_cfg = OptimizationConfig()
pipe_cfg = PipelineConfig()
bg = jnp.zeros(())
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
print(f"device: {jax.devices()[0]}", flush=True)

K = 10
B = 2
vi = np.arange(K * B) % n_views
w2c_b = w2c[vi].reshape(K, B, 4, 4)
proj_b = proj[vi].reshape(K, B, 4, 4)
ctr_b = ctr[vi].reshape(K, B, 3)
gts_b = gt_all[vi].reshape(K, B, H, W)


def fresh_ts():
    return T.init_train_state(
        cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    )


def chunk_b(ts_b):
    return sh.parallel_train_steps_scan(
        ts_b, (w2c_b, proj_b, ctr_b), gts_b, bg, opt_cfg, pipe_cfg,
        use_mask=False, mesh_shape=(("data", 1),), cam_geom=geom,
    )


ts_b = fresh_ts()
t0 = time.time()
ts_b, mb = chunk_b(ts_b)
float(np.asarray(mb["total"])[-1])
print(f"DP compile+chunk(K={K},B={B}) {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ts_b, mb = chunk_b(ts_b)
float(np.asarray(mb["total"])[-1])
dt = time.time() - t0
print(f"DP chunk: {dt/K*1e3:.1f} ms/step", flush=True)

with jax.profiler.trace("/tmp/trace_dp"):
    ts_b, mb = chunk_b(ts_b)
    jax.block_until_ready(mb["total"])
print("trace -> /tmp/trace_dp", flush=True)

# single-view comparison chunk at same K
vi1 = jnp.arange(K, dtype=jnp.int32) % n_views
ts1 = fresh_ts()


def chunk1(ts1):
    return T.train_steps_scan(
        ts1, (w2c[vi1], proj[vi1], ctr[vi1]), gt_all[vi1], bg, opt_cfg,
        pipe_cfg, use_mask=False, n_gaussians=12, cam_geom=geom,
    )


t0 = time.time()
ts1, m1 = chunk1(ts1)
float(np.asarray(m1["total"])[-1])
print(f"1-view compile+chunk {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ts1, m1 = chunk1(ts1)
float(np.asarray(m1["total"])[-1])
print(f"1-view chunk: {(time.time()-t0)/K*1e3:.1f} ms/step", flush=True)

with jax.profiler.trace("/tmp/trace_1v"):
    ts1, m1 = chunk1(ts1)
    jax.block_until_ready(m1["total"])
print("trace -> /tmp/trace_1v", flush=True)

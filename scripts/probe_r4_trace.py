#!/usr/bin/env python
"""Capture a profiler trace of the CURRENT full train step (round 4,
PAIRED_BLEND on) at the worst-case bench point and print per-op totals.

Usage: python scripts/probe_r4_trace.py [trace_dir]
Then:  python scripts/trace_summary.py <trace_dir> 40
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

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r4"
H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gts = [jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
       for _ in range(n_views)]
seed_pts = synthetic.grid_seed_points(15)
opt_cfg = OptimizationConfig()
pipe_cfg = PipelineConfig()
bg = jnp.zeros(())
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
K = 50
vi = jnp.arange(K, dtype=jnp.int32) % n_views
cam_arrays = (w2c[vi], proj[vi], ctr[vi])
gts_c = gt_all[vi]


def chunk(ts):
    return T.train_steps_scan(
        ts, cam_arrays, gts_c, bg, opt_cfg, pipe_cfg,
        use_mask=False, n_gaussians=12, cam_geom=geom,
    )


chunk_j = jax.jit(chunk, donate_argnums=0)
ts = jax.device_put(T.init_train_state(
    cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
), jax.devices()[0])
t0 = time.time()
ts, m = chunk_j(ts)
loss = float(np.asarray(m["total"])[-1])
print(f"compile+first+grant {time.time()-t0:.1f}s loss {loss:.4f}",
      flush=True)
# timed warm chunks (sync by value pull)
t0 = time.time()
for _ in range(4):
    ts, m = chunk_j(ts)
loss = float(np.asarray(m["total"])[-1])
dt = time.time() - t0
print(f"warm: {dt/(4*K)*1e3:.2f} ms/step ({4*K/dt*H*W/1e6:.1f} Mpix/s)",
      flush=True)
# traced chunk
jax.profiler.start_trace(trace_dir)
ts, m = chunk_j(ts)
loss = float(np.asarray(m["total"])[-1])
jax.profiler.stop_trace()
print(f"trace written to {trace_dir} (loss {loss:.4f})", flush=True)

#!/usr/bin/env python
"""Probe: table vs indirect blend flavor on the REAL scan-chunked train step.

The S(1) serial-emitter pathology (ROADMAP.md) lives in the table flavor's
payload gather / grad scatter / idx gather around the Pallas blend.  The
indirect flavor structurally removes the payload gather (fields stay
compact [P1, NF]; the per-tile index block rides SMEM) — and its gradient
scatter targets a compact [P1, 8] array whose consumer is plain XLA math,
not a Pallas call, so MSA has no reason to pin it.  The old "-13% at 49k
splats" number predates both the S(1) discovery and the dispatch-
contamination finding; this re-measures at the bench point in ONE process
with a hard value-roundtrip sync.

Both variants run at tile_capacity 1024 (Mosaic accepts rank-1 SMEM index
blocks only at K % 1024 == 0).
"""
import dataclasses
import importlib
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

H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gts = [jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
       for _ in range(n_views)]
seed_pts = synthetic.grid_seed_points(15)
opt_cfg = OptimizationConfig()
pipe_cfg = dataclasses.replace(PipelineConfig(), tile_capacity=1024)
bg = jnp.zeros(())
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
K = 16
vi = jnp.arange(K, dtype=jnp.int32) % n_views
cam_arrays = (w2c[vi], proj[vi], ctr[vi])
gtk = gt_all[vi]

for flavor in (sys.argv[1:] or ["table", "indirect", "table"]):
    os.environ["CGT_BLEND_FLAVOR"] = flavor
    Tv = importlib.reload(T)  # fresh jit wrappers -> retrace reads the env
    state = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    ts = Tv.init_train_state(state)
    t0 = time.time()
    ts, m = Tv.train_steps_scan(
        ts, cam_arrays, gtk, bg, opt_cfg, pipe_cfg, use_mask=False,
        n_gaussians=12, cam_geom=geom,
    )
    loss = float(m["total"][-1])  # hard sync (block_until_ready is enqueue-
    tc = time.time() - t0         # only on the axon runtime)
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        ts, m = Tv.train_steps_scan(
            ts, cam_arrays, gtk, bg, opt_cfg, pipe_cfg, use_mask=False,
            n_gaussians=12, cam_geom=geom,
        )
    loss = float(m["total"][-1])
    dt = (time.time() - t0) / (reps * K) * 1e3
    print(f"{flavor:10s} K=1024 {dt:8.3f} ms/step  (compile {tc:.1f}s, "
          f"loss {loss:.4f})", flush=True)
print("done", flush=True)

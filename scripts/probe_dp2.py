#!/usr/bin/env python
"""Clean timing of the DP batched-view path at bench shapes.

probe_dp_variants lessons: (1) block_until_ready does NOT force execution
on the axon runtime — always pull a VALUE to the host; (2) the shard_map
path recompiles on its SECOND call (the donated state comes back with
NamedSharding while call 1 saw single-device inputs), so warm TWO calls
before timing.  This probe times the B=2 K=50 bench point properly and
A/Bs pre-committing the inputs to their mesh shardings.
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
from jax.sharding import NamedSharding, PartitionSpec as P

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.parallel import sharding as sh

H = W = 512
n_views = 4
K = 50
B = 2
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gt_all = jnp.asarray(rng.uniform(size=(n_views, H, W)) ** 4, jnp.float32)
seed_pts = synthetic.grid_seed_points(15)
opt_cfg = OptimizationConfig()
pipe_cfg = PipelineConfig()
bg = jnp.zeros(())
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
print(f"device: {jax.devices()[0]}", flush=True)

vi = np.arange(K * B) % n_views
batch = (
    w2c[vi].reshape(K, B, 4, 4),
    proj[vi].reshape(K, B, 4, 4),
    ctr[vi].reshape(K, B, 3),
    gt_all[vi].reshape(K, B, H, W),
)


def fresh_ts():
    return T.init_train_state(
        cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    )


def call(ts, b):
    ts, mb = sh.parallel_train_steps_scan(
        ts, b[:3], b[3], bg, opt_cfg, pipe_cfg, use_mask=False,
        mesh_shape=(("data", 1),), cam_geom=geom,
    )
    return ts, mb


def measure(label, ts, b, warm=2, reps=3):
    for i in range(warm):
        t0 = time.time()
        ts, mb = call(ts, b)
        v = float(np.asarray(mb["total"])[-1])
        print(f"{label}: warm{i} {time.time()-t0:.2f}s (loss {v:.3f})",
              flush=True)
    times = []
    for _ in range(reps):
        t0 = time.time()
        ts, mb = call(ts, b)
        float(np.asarray(mb["total"])[-1])
        times.append(time.time() - t0)
    per = min(times) / K * 1e3
    print(f"{label}: chunks {[f'{t:.2f}' for t in times]} s -> "
          f"{per:.1f} ms/step, {1e3/per:.1f} steps/s", flush=True)
    return ts


# 1) as the bench does it (uncommitted inputs)
measure("uncommitted", fresh_ts(), batch)

# 2) inputs + state pre-committed to their mesh shardings
mesh = sh.make_mesh(1)
repl = NamedSharding(mesh, P())
shard = NamedSharding(mesh, P(None, "data"))
ts_c = jax.device_put(fresh_ts(), repl)
batch_c = tuple(jax.device_put(a, shard) for a in batch)
bg = jax.device_put(bg, repl)
measure("committed  ", ts_c, batch_c)

# 3) single-view control at the same shapes (value-forced)
ts = fresh_ts()
vi1 = jnp.arange(K, dtype=jnp.int32) % n_views
for i in range(2):
    t0 = time.time()
    ts, m = T.train_steps_scan(
        ts, (w2c[vi1], proj[vi1], ctr[vi1]), gt_all[vi1], bg, opt_cfg,
        pipe_cfg, use_mask=False, n_gaussians=12, cam_geom=geom,
    )
    float(np.asarray(m["total"])[-1])
    print(f"control: warm{i} {time.time()-t0:.2f}s", flush=True)
times = []
for _ in range(3):
    t0 = time.time()
    ts, m = T.train_steps_scan(
        ts, (w2c[vi1], proj[vi1], ctr[vi1]), gt_all[vi1], bg, opt_cfg,
        pipe_cfg, use_mask=False, n_gaussians=12, cam_geom=geom,
    )
    float(np.asarray(m["total"])[-1])
    times.append(time.time() - t0)
print(f"control: chunks {[f'{t:.2f}' for t in times]} s -> "
      f"{min(times)/K*1e3:.1f} ms/step", flush=True)

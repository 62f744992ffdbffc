#!/usr/bin/env python
"""Untraced timing grid for the DP batched-view slowdown.

Bench (K=50): DP B=2 ~350 ms/step; probe (K=10): 6141 ms/step; single-view
scan: 11.8 ms/step.  Device sync-op time per DP step is normal (~2x one
view, trace_dp), so the wall gap is stall/idle.  Discriminate:

  a) parallel_train_steps_scan K=10 B=2  (the slow case, repeated 3x)
  b) parallel_train_steps_scan K=10 B=1  (batching out)
  c) jit(_local_batch_step) no shard_map, B=2, python loop of 10
  d) parallel_train_step (shard_map, no outer scan) B=2, python loop of 10
  e) train_steps_scan K=10 (control)
"""
import functools
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

K = 10


def fresh_ts():
    return T.init_train_state(
        cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    )


def batch(B):
    vi = np.arange(K * B) % n_views
    return (
        w2c[vi].reshape(K, B, 4, 4),
        proj[vi].reshape(K, B, 4, 4),
        ctr[vi].reshape(K, B, 3),
        gt_all[vi].reshape(K, B, H, W),
    )


def run_case(label, fn, reps=3):
    ts = fresh_ts()
    t0 = time.time()
    ts, out = fn(ts)
    jax.block_until_ready(out)
    print(f"{label}: first(compile?) {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.time()
        ts, out = fn(ts)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    per = min(times) / K * 1e3
    print(f"{label}: chunk times {[f'{t:.2f}' for t in times]} s "
          f"-> best {per:.1f} ms/step", flush=True)


# a) the slow case
w2b, prb, ctb, gtb = batch(2)


def case_a(ts):
    ts, mb = sh.parallel_train_steps_scan(
        ts, (w2b, prb, ctb), gtb, bg, opt_cfg, pipe_cfg, use_mask=False,
        mesh_shape=(("data", 1),), cam_geom=geom,
    )
    return ts, mb["total"]


run_case("a) DP scan K=10 B=2", case_a)

# b) B=1 through the same machinery
w1, p1, c1, g1 = batch(1)


def case_b(ts):
    ts, mb = sh.parallel_train_steps_scan(
        ts, (w1, p1, c1), g1, bg, opt_cfg, pipe_cfg, use_mask=False,
        mesh_shape=(("data", 1),), cam_geom=geom,
    )
    return ts, mb["total"]


run_case("b) DP scan K=10 B=1", case_b)


# c) no shard_map: local batch step scanned under plain jit
@functools.partial(
    jax.jit, static_argnames=("use_mask",), donate_argnums=(0,),
    compiler_options=T.COMPILER_OPTS,
)
def plain_scan(ts, cam_arrays, gts, bg, use_mask):
    def body(ts, xs):
        w2c_s, proj_s, ctr_s, gt_s = xs
        return sh._local_batch_step(
            ts, (w2c_s, proj_s, ctr_s, gt_s), bg, opt_cfg, pipe_cfg,
            use_mask, None, geom, n_dev=1,
        )

    return jax.lax.scan(body, ts, (*cam_arrays, gts))


def case_c(ts):
    ts, mb = plain_scan(ts, (w2b, prb, ctb), gtb, bg, False)
    return ts, mb["total"]


run_case("c) plain-jit scan K=10 B=2", case_c)


# d) shard_map per-step (no outer scan)
def case_d(ts):
    out = None
    for k in range(K):
        ts, m = sh.parallel_train_step(
            ts, (w2b[k], prb[k], ctb[k]), gtb[k], bg, opt_cfg, pipe_cfg,
            False, (("data", 1),), geom,
        )
        out = m["total"]
    return ts, out


run_case("d) DP per-step x10 B=2", case_d, reps=2)

# e) single-view control
vi1 = jnp.arange(K, dtype=jnp.int32) % n_views


def case_e(ts):
    ts, m = T.train_steps_scan(
        ts, (w2c[vi1], proj[vi1], ctr[vi1]), gt_all[vi1], bg, opt_cfg,
        pipe_cfg, use_mask=False, n_gaussians=12, cam_geom=geom,
    )
    return ts, m["total"]


run_case("e) 1-view scan K=10", case_e)

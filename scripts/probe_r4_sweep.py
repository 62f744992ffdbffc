#!/usr/bin/env python
"""Sweep kernel pipeline widths on TPU: bwd _BPIPE, fwd (_FWD_CHUNK, _PIPE).

Measures the scanned full train step at the bench worst-case point per
config (module constants are trace-time; caches cleared between configs).
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
from curve_gaussian_tpu.ops import rasterize_pallas as RP

H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
gts = [jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
       for _ in range(n_views)]
seed_pts = synthetic.grid_seed_points(15)
pipe_cfg = PipelineConfig()
opt_cfg = OptimizationConfig()
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
K = 50
bg = jnp.zeros(())


def clear():
    RP._make_fwd_kernel.cache_clear()
    RP._make_bwd_kernel.cache_clear()
    RP._make_bwd_moment_kernel.cache_clear()
    RP._make_bwd_moment_rmw_kernel.cache_clear()
    jax.clear_caches()


def measure(tag):
    clear()
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
    float(np.asarray(m["total"])[-1])  # sync: absorbs grant wait + compile
    c = time.time() - t0
    ts, m = chunk(ts)  # warm chunk (absorbs any residual recompile)
    float(np.asarray(m["total"])[-1])
    t0 = time.time()
    for i in range(4):
        ts, m = chunk(ts)
    loss = float(m["total"][-1])
    dt = time.time() - t0
    print(f"{tag}: {dt/200*1e3:.2f} ms/step, {200/dt*H*W/1e6:.1f} Mpix/s "
          f"(compile+grant {c:.0f}s, loss {loss:.4f})", flush=True)


measure(f"baseline GRP={RP._BWD_GROUP} BPIPE={RP._BPIPE} "
        f"FWD=({RP._FWD_CHUNK},{RP._PIPE})")
measure("repeat-baseline")  # run-to-run variance check
RP._BWD_GROUP = 8
measure("GRP=8 (round-3 width)")
RP._BWD_GROUP = 64
measure("GRP=64")
RP._BWD_GROUP = 32
RP._BPIPE = 8
measure("GRP=32 BPIPE=8")
RP._BPIPE = 4
RP._FWD_CHUNK = 128
measure("FWD=(128,8)")
RP._FWD_CHUNK = 64
print("done")

#!/usr/bin/env python
"""Round-5 third A/B: big-tier compaction by stable sort vs the round-2
scatter (binning.BIG_COMPACT_SORT), from the committed defaults.

Same laws as probe_r5_ab: one grant, interleaved visits, medians.
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
pipe_cfg = PipelineConfig()  # new defaults incl. big_capacity 256
opt_cfg = OptimizationConfig()
w2c = jnp.stack([c.world_to_cam for c in cams])
proj = jnp.stack([c.full_proj for c in cams])
ctr = jnp.stack([c.cam_center for c in cams])
geom = (H, W, cams[0].tanfovx, cams[0].tanfovy)
gt_all = jnp.stack(gts)
K = 50
bg = jnp.zeros(())

fns = {}


from curve_gaussian_tpu.ops import binning as B


def get_fn(cfg):
    if cfg in fns:
        return fns[cfg]
    (big_sort,) = cfg
    B.BIG_COMPACT_SORT = big_sort
    RP._make_bwd_moment_rmw_paired.cache_clear()
    RP._make_fwd_train_paired.cache_clear()
    import functools

    @functools.partial(
        jax.jit, static_argnames=("um",), donate_argnums=(0,))
    def chunk(ts, cam_arrays, gts_c, um=False):
        return T.train_steps_scan.__wrapped__(
            ts, cam_arrays, gts_c, bg, opt_cfg, pipe_cfg, use_mask=um,
            n_gaussians=12, cam_geom=geom,
        )

    fns[cfg] = chunk
    return chunk


def fresh_ts():
    state = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
    return jax.device_put(T.init_train_state(state), jax.devices()[0])


vi = jnp.arange(K, dtype=jnp.int32) % n_views
cam_arrays = (w2c[vi], proj[vi], ctr[vi])
gts_c = gt_all[vi]

NAMES = {
    (True,): "bsort",
    (False,): "bscat",
}
CONFIGS = [(True,), (False,)] * 3

results = {}
for visit, cfg in enumerate(CONFIGS):
    chunk = get_fn(cfg)
    ts = fresh_ts()
    t0 = time.time()
    ts, m = chunk(ts, cam_arrays, gts_c)
    float(np.asarray(m["total"])[-1])
    warm = time.time() - t0
    ts, m = chunk(ts, cam_arrays, gts_c)
    float(np.asarray(m["total"])[-1])
    t0 = time.time()
    for _ in range(4):
        ts, m = chunk(ts, cam_arrays, gts_c)
    loss = float(np.asarray(m["total"])[-1])
    dt = time.time() - t0
    results.setdefault(cfg, []).append(dt / 200 * 1e3)
    print(f"visit {visit:2d} {NAMES[cfg]}: {dt/200*1e3:.3f} ms/step "
          f"({200/dt*H*W/1e6:.1f} Mpix/s; warm {warm:.0f}s, "
          f"loss {loss:.4f})", flush=True)

print("--- medians ---")
for cfg, v in results.items():
    med = float(np.median(v))
    print(f"{NAMES[cfg]}: {med:.3f} ms/step ({H*W/med/1e3:.1f} Mpix/s) "
          f"all {[f'{x:.3f}' for x in v]}", flush=True)
print("done")

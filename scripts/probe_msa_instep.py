#!/usr/bin/env python
"""Probe: A/B MSA off-switches on the REAL scan-chunked train step.

The S(1) serial-emitter pathology is proven in the full train-step module
(ROADMAP.md trace table); isolated harnesses may not reproduce it.  This
times `train_steps_scan` (K=16, bench shapes) per compiler_options variant
in ONE process (dispatch contamination cancels), by reloading engine.train
with CGT_COMPILER_OPTS set per variant (the env hook the production entry
points use).

Usage: probe_msa_instep.py '{"xla_msa_enable":"false"}' ... (default sweep
if no args).
"""
import importlib
import json
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
pipe_cfg = PipelineConfig()
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

variants = [None] + [json.loads(a) for a in sys.argv[1:]]
if len(variants) == 1:
    variants += [
        {"xla_vf_vmem_memory_space_assignment": "false"},
        {"xla_msa_enable": "false"},
        {"xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments": "false"},
    ]

for opts in variants:
    label = json.dumps(opts)
    try:
        if opts is None:
            os.environ.pop("CGT_COMPILER_OPTS", None)
        else:
            os.environ["CGT_COMPILER_OPTS"] = json.dumps(opts)
        Tv = importlib.reload(T)
        state = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
        ts = Tv.init_train_state(state)
        t0 = time.time()
        ts, m = Tv.train_steps_scan(
            ts, cam_arrays, gtk, bg, opt_cfg, pipe_cfg, use_mask=False,
            n_gaussians=12, cam_geom=geom,
        )
        # float() is a device-value roundtrip — the only HARD sync on the
        # axon runtime (block_until_ready returns at enqueue; probed: it
        # reported 0.014 ms/step for a 14 ms step)
        loss = float(m["total"][-1])
        tc = time.time() - t0
        t0 = time.time()
        reps = 8
        for _ in range(reps):
            ts, m = Tv.train_steps_scan(
                ts, cam_arrays, gtk, bg, opt_cfg, pipe_cfg, use_mask=False,
                n_gaussians=12, cam_geom=geom,
            )
        loss = float(m["total"][-1])
        dt = (time.time() - t0) / (reps * K) * 1e3
        print(f"{label:70s} {dt:8.3f} ms/step  (compile {tc:.1f}s, "
              f"loss {loss:.4f})", flush=True)
    except Exception as e:
        print(f"{label:70s} FAILED: {type(e).__name__}: {e}", flush=True)
print("done", flush=True)

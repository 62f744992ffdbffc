#!/usr/bin/env python
"""Probe: what prior process activity makes later gathers 30x slower?

Run modes (CGT_PROBE_MODE):
  none    : time the bare gather only                       (expected fast)
  import  : import curve_gaussian_tpu first                 (?)
  run     : import AND run preprocess+binning first         (expected slow)
  numpy   : no package; allocate comparable big buffers     (?)
  sort    : no package; run a lax.sort of binning's shape   (?)
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

mode = os.environ.get("CGT_PROBE_MODE", "none")
print("mode:", mode, flush=True)

if mode in ("import", "run"):
    import curve_gaussian_tpu  # noqa: F401
if mode.startswith("run"):
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.models import curve_state as cs
    from curve_gaussian_tpu.ops import binning as B
    from curve_gaussian_tpu.ops.projection import preprocess

    cams = synthetic.ring_cameras(4, 512, 512)
    seed_pts = synthetic.grid_seed_points(15)
    state_r = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
    gsr = cs.gaussians(state_r)
    if mode in ("run", "run_pre", "run_bin"):
        pre = jax.jit(
            lambda: preprocess(
                gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cams[0],
                alive=gsr["alive"],
            )
        )()
        jax.block_until_ready(pre)
    if mode in ("run", "run_bin"):
        jax.block_until_ready(
            jax.jit(lambda: B.bin_gaussians(pre, 512, 512, capacity=896))()
        )
    if mode == "run_gauss":
        jax.block_until_ready(gsr["xyz"])  # just the model-state compute
if mode == "sort":
    NP = 245760
    rng0 = np.random.default_rng(1)
    ks = (jnp.asarray(rng0.integers(0, 256, NP).astype(np.int32)),
          jnp.asarray(rng0.standard_normal(NP), jnp.float32),
          jnp.asarray(rng0.integers(0, 49152, NP).astype(np.int32)))
    jax.block_until_ready(jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3))(*ks))
if mode == "numpy":
    rng0 = np.random.default_rng(1)
    keep = [jnp.asarray(rng0.standard_normal((1000, 1000)), jnp.float32)
            for _ in range(30)]
    jax.block_until_ready(keep)

T, K, P = 256, 896, 49152
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
ridx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))


@jax.jit
def bare(fields, idx):
    return fields[idx]


@jax.jit
def tiny(x):
    return x + 1.0


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/reps*1e3:.3f} ms", flush=True)


timeit(bare, fields, ridx, label="bare gather")
timeit(tiny, jnp.ones((8, 128)), label="tiny add")
timeit(bare, fields, ridx, label="bare gather again")

if os.environ.get("CGT_PROBE_TRACE"):
    d = os.environ["CGT_PROBE_TRACE"]
    with jax.profiler.trace(d):
        for _ in range(10):
            out = bare(fields, ridx)
        jax.block_until_ready(out)
    print(f"trace -> {d}", flush=True)

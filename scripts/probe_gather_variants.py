#!/usr/bin/env python
"""Same-process comparison of gather variants + optimized HLO dump.

probe_barrier.py saw 0.03 ms for gather+select; probe_data_dep.py saw
1.18 ms for a bare gather of identical shape.  Run every variant in one
process, then dump the optimized HLO of the fast and slow ones.
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

T, K, P = 256, 896, 49152
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
ridx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
ok = jnp.asarray(rng.uniform(size=(T, K)) < 0.7)


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:56s} {ms:8.3f} ms", flush=True)
    return ms


@jax.jit
def bare(fields, idx):
    return fields[idx]


@jax.jit
def with_select(fields, idx, ok):
    pay = fields[jnp.where(ok, idx, P - 1)]
    return jnp.where(ok[..., None], pay, 0.0)


@jax.jit
def bare_flat(fields, idx):
    return fields[idx.reshape(-1)]


@jax.jit
def take_clip(fields, idx):
    return jnp.take(fields, idx, axis=0, mode="clip")


@jax.jit
def bare_sum(fields, idx):
    return fields[idx].sum()


timeit(bare, fields, ridx, label="bare gather [T,K] idx")
timeit(with_select, fields, ridx, ok, label="gather + where select (probe_barrier style)")
timeit(bare_flat, fields, ridx, label="bare gather flat idx [T*K]")
timeit(take_clip, fields, ridx, label="jnp.take mode=clip")
timeit(bare_sum, fields, ridx, label="gather -> sum (no materialize)")

for name, fn, args in [
    ("bare", bare, (fields, ridx)),
    ("with_select", with_select, (fields, ridx, ok)),
]:
    txt = fn.lower(*args).compile().as_text()
    open(f"/tmp/hlo_{name}.txt", "w").write(txt)
    print(f"wrote /tmp/hlo_{name}.txt ({len(txt)} chars)", flush=True)

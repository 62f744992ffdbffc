#!/usr/bin/env python
"""Probe: contiguous-slice table construction vs XLA row gathers.

The step profile shows three per-row indexed ops dominating the train step
(payload gather 3.2 ms, grad scatter 3.1 ms, idx-table gather 1.6 ms; all
~14 ns/row at T*K=229k rows).  Each tile's table row is a CONTIGUOUS slice
of the (tile,depth)-sorted pair array, so the gathers can be restated as a
T-iteration lax.scan of dynamic_slice block copies.  This probes the
primitives at the bench shape before committing to the design:

  A. XLA gather  [T,K] rows from f32[NP,8]      (payload table, today)
  B. scan-slice  [T] x dynamic_slice (K,8)      (proposed)
  C. XLA gather  [T,K] elems from i32[NP]       (idx table, today)
  D. scan-slice  [T] x dynamic_slice (K,) i32   (proposed)
  E. 4-operand sort at NP (today's binning sort)
  F. 12-operand sort at NP (3 keys + 8 payload floats + idx ride along)
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

T, K, NP, P = 256, 896, 245760, 49152
rng = np.random.default_rng(0)
# plausible starts: sorted random split of NP into T segments
cuts = np.sort(rng.integers(0, NP, T - 1))
starts = jnp.asarray(np.concatenate([[0], cuts]).astype(np.int32))
src = jnp.asarray(rng.standard_normal((NP, 8)), jnp.float32)
sv = jnp.asarray(rng.integers(0, P, NP).astype(np.int32))


def timeit(f, *a, reps=30, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:44s} {ms:8.3f} ms")
    return ms


@jax.jit
def gather_f32(src, starts):
    idx2 = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return src[jnp.minimum(idx2, NP - 1)]


@jax.jit
def slice_f32(src, starts):
    def body(_, s):
        return None, jax.lax.dynamic_slice(src, (s, 0), (K, 8))

    _, out = jax.lax.scan(body, None, jnp.minimum(starts, NP - K))
    return out


@jax.jit
def gather_i32(sv, starts):
    idx2 = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    return sv[jnp.minimum(idx2, NP - 1)]


@jax.jit
def slice_i32(sv, starts):
    def body(_, s):
        return None, jax.lax.dynamic_slice(sv, (s,), (K,))

    _, out = jax.lax.scan(body, None, jnp.minimum(starts, NP - K))
    return out


keys = (
    jnp.asarray(rng.integers(0, T, NP).astype(np.int32)),
    jnp.asarray(rng.standard_normal(NP), jnp.float32),
    jnp.asarray(rng.integers(0, P, NP).astype(np.int32)),
)
pay_ops = tuple(src[:, i] for i in range(8))


@jax.jit
def sort4(a, b, c):
    return jax.lax.sort((a, b, c, jnp.arange(NP, dtype=jnp.int32)), num_keys=3)


@jax.jit
def sort12(a, b, c, *pay):
    return jax.lax.sort((a, b, c, *pay, jnp.arange(NP, dtype=jnp.int32)),
                        num_keys=3)


print(f"device: {jax.devices()[0]}")
ga = timeit(gather_f32, src, starts, label="A. XLA gather f32[NP,8] -> [T,K,8]")
sa = timeit(slice_f32, src, starts, label="B. scan dynamic_slice f32 -> [T,K,8]")
gi = timeit(gather_i32, sv, starts, label="C. XLA gather i32[NP] -> [T,K]")
si = timeit(slice_i32, sv, starts, label="D. scan dynamic_slice i32 -> [T,K]")
s4 = timeit(sort4, *keys, label="E. 4-operand sort @245k")
s12 = timeit(sort12, *keys, *pay_ops, label="F. 12-operand sort @245k")

# sanity: same values where the clamp paths agree
a = gather_f32(src, starts)
b = slice_f32(src, starts)
ok = bool(jnp.all(a[starts + K <= NP - 1] == b[starts + K <= NP - 1]))
print("slice == gather on in-range rows:", ok)
print(f"payload via sort-ride + slice: {s12 - s4 + sa:.3f} ms "
      f"vs gather {ga:.3f} ms")

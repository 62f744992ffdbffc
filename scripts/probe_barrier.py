#!/usr/bin/env python
"""Probe: do optimization_barriers unfuse gathers/scatters onto fast paths?

Isolated XLA gather/scatter of the step's shapes run at memcpy-like speed
(0.03-1.3 ms) but the step's fused kCustom versions cost 1.6-3.2 ms.  Test
whether jax.lax.optimization_barrier around indices/operands restores the
standalone emitters inside a bigger computation.
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

T, K, NP, P = 256, 896, 245760, 49152
TK = T * K
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
ridx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
ok = jnp.asarray(rng.uniform(size=(T, K)) < 0.7)
grads = jnp.asarray(rng.standard_normal((T, K, 8)), jnp.float32)
sv = jnp.asarray(rng.integers(0, P, NP).astype(np.int32))
cuts = np.sort(rng.integers(0, NP, T - 1))
starts = jnp.asarray(np.concatenate([[0], cuts]).astype(np.int32))


def timeit(f, *a, reps=40, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:58s} {ms:8.3f} ms", flush=True)
    return ms


OB = jax.lax.optimization_barrier

# --- payload gather: in-graph index chain + select, fused vs barriered ----


@jax.jit
def pg_fused(fields, ridx, ok):
    idx = jnp.where(ok, ridx, P - 1)  # in-graph index compute
    pay = fields[idx]
    return jnp.where(ok[..., None], pay, 0.0)


@jax.jit
def pg_barrier(fields, ridx, ok):
    idx = OB(jnp.where(ok, ridx, P - 1))
    pay = OB(fields[idx])
    return jnp.where(ok[..., None], pay, 0.0)


timeit(pg_fused, fields, ridx, ok, label="payload gather, fused (in-graph idx+select)")
timeit(pg_barrier, fields, ridx, ok, label="payload gather, optimization_barrier")

# --- grad scatter-add: select + scatter, fused vs barriered --------------


@jax.jit
def sc_fused(grads, ridx, ok):
    g = jnp.where(ok[..., None], grads, 0.0)
    idx = jnp.where(ok, ridx, P)
    return jnp.zeros((P, 8), jnp.float32).at[idx.reshape(-1)].add(
        g.reshape(-1, 8), mode="drop"
    )


@jax.jit
def sc_barrier(grads, ridx, ok):
    g = OB(jnp.where(ok[..., None], grads, 0.0))
    idx = OB(jnp.where(ok, ridx, P))
    out = jnp.zeros((P, 8), jnp.float32).at[idx.reshape(-1)].add(
        g.reshape(-1, 8), mode="drop"
    )
    return OB(out)


timeit(sc_fused, grads, ridx, ok, label="grad scatter, fused (select in-graph)")
timeit(sc_barrier, grads, ridx, ok, label="grad scatter, optimization_barrier")

# --- idx table: contiguous gather from sorted pairs, fused vs barrier ----


@jax.jit
def it_fused(sv, starts):
    idx2 = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = idx2 < (starts[:, None] + K)  # stand-in select
    g = sv[jnp.minimum(idx2, NP - 1)]
    return jnp.where(valid, g, P)


@jax.jit
def it_barrier(sv, starts):
    idx2 = OB(starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :])
    g = OB(sv[jnp.minimum(idx2, NP - 1)])
    valid = idx2 < (starts[:, None] + K)
    return jnp.where(valid, g, P)


timeit(it_fused, sv, starts, label="idx table gather, fused")
timeit(it_barrier, sv, starts, label="idx table gather, optimization_barrier")

# --- combined: the three ops chained like the real backward --------------


@jax.jit
def chain_fused(fields, sv, starts, grads):
    gi = it_fused.__wrapped__(sv, starts)
    ok2 = gi < P
    pay = pg_fused.__wrapped__(fields, gi, ok2)
    loss_g = grads * pay  # stand-in for kernel work
    return sc_fused.__wrapped__(loss_g, gi, ok2)


@jax.jit
def chain_barrier(fields, sv, starts, grads):
    gi = it_barrier.__wrapped__(sv, starts)
    ok2 = gi < P
    pay = pg_barrier.__wrapped__(fields, gi, ok2)
    loss_g = grads * pay
    return sc_barrier.__wrapped__(loss_g, gi, ok2)


timeit(chain_fused, fields, sv, starts, grads, label="chained all three, fused")
timeit(chain_barrier, fields, sv, starts, grads, label="chained all three, barriered")

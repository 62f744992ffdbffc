#!/usr/bin/env python
"""Probe: why are gathers/scatters 100x slower inside the train-step scan?

probe_slice_gather.py showed isolated gathers at 0.017 ms where the step
trace shows 3.18 ms for the same shapes.  Differences to isolate:
  * random (gaussian-id) indices vs contiguous (sorted-order slices)
  * op standing alone vs inside a lax.scan body (the chunked train loop)
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

T, K, NP, P = 256, 896, 245760, 49152
TK = T * K
R = 50  # scan length, like a train chunk
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, 8)), jnp.float32)
ridx = jnp.asarray(rng.integers(0, P, TK).astype(np.int32))  # random gids
cuts = np.sort(rng.integers(0, NP, T - 1))
starts = jnp.asarray(np.concatenate([[0], cuts]).astype(np.int32))
grads = jnp.asarray(rng.standard_normal((TK, 8)), jnp.float32)


def timeit(f, *a, reps=20, label="", per=1):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3 / per
    print(f"{label:52s} {ms:8.3f} ms")
    return ms


@jax.jit
def g_rand(fields, ridx):
    return fields[ridx]


@jax.jit
def s_rand(grads, ridx):
    return jnp.zeros((P, 8), jnp.float32).at[ridx].add(grads, mode="drop")


@jax.jit
def g_rand_scan(fields, ridx):
    def body(c, _):
        out = fields[ridx + c]  # c varies so nothing hoists
        return c + 1, jnp.float32(out.sum())

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


@jax.jit
def s_rand_scan(grads, ridx):
    def body(c, _):
        out = jnp.zeros((P, 8), jnp.float32).at[
            jnp.minimum(ridx + c, P - 1)
        ].add(grads, mode="drop")
        return c + 1, jnp.float32(out.sum())

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


@jax.jit
def g_cont_scan(fields, starts):
    src = jnp.tile(fields, (5, 1))  # [245760, 8]
    def body(c, _):
        idx2 = jnp.minimum(
            starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :] + c,
            NP - 1,
        )
        return c + 1, jnp.float32(src[idx2].sum())

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


@jax.jit
def slice_scan(fields, starts):
    src = jnp.tile(fields, (5, 1))
    def body(c, _):
        def inner(_, s):
            return None, jax.lax.dynamic_slice(src, (s, 0), (K, 8))

        _, out = jax.lax.scan(
            inner, None, jnp.minimum(starts + c, NP - K)
        )
        return c + 1, jnp.float32(out.sum())

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


print(f"device: {jax.devices()[0]}")
timeit(g_rand, fields, ridx, label="random gather [P,8]->[TK,8], isolated")
timeit(s_rand, grads, ridx, label="random scatter-add [TK,8]->[P,8], isolated")
timeit(g_rand_scan, fields, ridx, per=R,
       label="random gather inside 50-step scan (per step)")
timeit(s_rand_scan, grads, ridx, per=R,
       label="random scatter inside 50-step scan (per step)")
timeit(g_cont_scan, fields, starts, per=R,
       label="contiguous gather inside scan (per step)")
timeit(slice_scan, fields, starts, per=R,
       label="dynamic_slice table build inside scan (per)")

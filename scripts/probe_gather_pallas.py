#!/usr/bin/env python
"""Minimal repro: random gather feeding a Pallas call, inside a scan.

Hypothesis from the step trace: the [T,K,8] payload gather that costs
0.04 ms standalone costs 3.2 ms in the train step because its output is a
Pallas-call operand with an S(1) (scoped-VMEM) layout — XLA materializes
the gather directly into VMEM through a slow path.  Toggle: consume the
gather with (a) plain XLA reduce, (b) a Pallas kernel, both inside a scan.
"""
import functools
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, NF, P = 256, 896, 8, 49152
TK = T * K
R = 20
rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P, NF)), jnp.float32)
ridx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
counts = jnp.full((T,), K, jnp.int32)


def kernel(pay_ref, out_ref):
    # touch every payload element cheaply: full-sum broadcast to the out tile
    s = jnp.sum(pay_ref[0])
    base = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    out_ref[...] = base * 0.0 + s


def pallas_consume(payload):
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, NF), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), jnp.float32),
    )(payload)


@jax.jit
def scan_xla(fields, ridx):
    def body(c, _):
        pay = fields[jnp.minimum(ridx + c, P - 1)]
        return c + 1, pay.sum()

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


@jax.jit
def scan_pallas(fields, ridx):
    def body(c, _):
        pay = fields[jnp.minimum(ridx + c, P - 1)]
        return c + 1, pallas_consume(pay).sum()

    _, s = jax.lax.scan(body, jnp.int32(0), None, length=R)
    return s


@jax.jit
def iso_pallas(fields, ridx):
    pay = fields[ridx]
    return pallas_consume(pay).sum()


def timeit(f, *a, reps=20, label="", per=1):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3 / per
    print(f"{label:56s} {ms:8.3f} ms", flush=True)
    return ms


print(f"device: {jax.devices()[0]}", flush=True)
print("XLA_FLAGS:", os.environ.get("XLA_FLAGS", ""), flush=True)
timeit(scan_xla, fields, ridx, per=R, label="gather -> XLA sum, in scan (per step)")
timeit(iso_pallas, fields, ridx, label="gather -> pallas consumer, isolated")
timeit(scan_pallas, fields, ridx, per=R,
       label="gather -> pallas consumer, in scan (per step)")

#!/usr/bin/env python
"""Measure the FIXED per-grid-step cost of a Pallas call on v5e.

Round-4 context: paired tiles (256 -> 128 grid steps, same work) saved
~0.2 ms => ~1.6 us/step fixed.  This probe times a minimal kernel (tiny
vector body, one (8,128) image output per tile, counts prefetch) at
1, 2, 4, 8 and 16 tiles per program — if a fixed per-step cost
dominates, time falls ~linearly with program count.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REG_H, REG_W = 8, 128
nty = ntx = 16
TT = nty * ntx
counts = jnp.full((TT,), 100, jnp.int32)


def make_fn(tpp: int):
    """tpp = tiles per program (1..ntx)."""
    ntp = ntx // tpp

    def kernel(counts_ref, bg_ref, col_ref):
        fdt = jnp.float32
        ty = pl.program_id(0)
        tj = pl.program_id(1)
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        base = bg_ref[0]
        for q in range(tpp):
            v = il.astype(fdt) * 1e-3 + base + float(q)
            col_ref[q * REG_H : (q + 1) * REG_H, :] = v * 0.5 + ty.astype(
                fdt
            ) + tj.astype(fdt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntp),
        in_specs=[],
        out_specs=[
            pl.BlockSpec(
                (tpp * REG_H, REG_W), lambda i, j, c, b: (i * ntp + j, 0)
            )
        ],
    )

    def one(carry, _):
        bg = carry[None] * 1e-6
        (c,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((TT * REG_H, REG_W), jnp.float32)],
        )(counts, bg)
        return c[0, 0], c[1, 1]

    @jax.jit
    def run(c0):
        return jax.lax.scan(one, c0, None, length=100)

    return run


CONFIGS = (1, 2, 4, 8, 16, 1)
fns = {t: make_fn(t) for t in set(CONFIGS)}
for rep in range(3):
    for tpp in CONFIGS:
        run = fns[tpp]
        c, _ = run(jnp.float32(rep))
        _ = float(np.asarray(c))
        t0 = time.time()
        c, _ = run(jnp.float32(rep + 5))
        _ = float(np.asarray(c))
        dt = (time.time() - t0) / 100
        n_steps = nty * (ntx // tpp)
        print(f"rep {rep} tiles/program={tpp:2d} ({n_steps:3d} steps): "
              f"{dt*1e6:7.1f} us/call = {dt*1e6/n_steps:6.2f} us/step",
              flush=True)
print("done")

#!/usr/bin/env python
"""Marginal cost of the strip-layout candidate primitives on v5e.

The instance-per-sublane blend redesign (8 instances x 128-px strips per
vreg; prefix-product transmittance; vector field loads) is only a win if
these lower cheaply:

  fma        — baseline: chained (8,128) FMA
  subred     — jnp.sum(axis=0) (8,128) -> (1,128) [cross-sublane]
  lanered    — jnp.sum(axis=1, keepdims) (8,128) -> (8,1) [cross-lane]
  roll       — pltpu.roll(axis=0) (the prefix-scan shuffle)
  vload      — (8,1) payload slice load at dynamic 8-aligned sublane base
  bcastmul   — (8,1) x (1,128) outer-broadcast multiply

Each kernel's while body chains REPS copies of the primitive; the slope
((t_REPS - t_1) / (REPS-1) / instances) is the marginal cost, immune to
the fixed loop/iteration overhead.  Interleaved in one process.
"""
import functools
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
counts = jnp.full((TT,), 256, jnp.int32)  # 256 "instances" per tile
K, NF = 896, 8
rng = np.random.default_rng(0)
payload = jnp.asarray(rng.uniform(0.5, 1.5, (TT, K, NF)), jnp.float32)
GRP = 32


def make_fn(prim: str, reps: int):
    def kernel(counts_ref, bg_ref, payload_ref, col_ref):
        fdt = jnp.float32
        t = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        n = counts_ref[t]
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        base8 = bg_ref[0]
        x0 = il.astype(fdt) * 1e-3 + base8
        row0 = x0[0:1, :] * 0.5  # (1,128)

        def body(st):
            g, acc = st
            x = acc
            for s in range(GRP // 8):
                jbase = g * GRP + s * 8
                if prim == "fma":
                    for _ in range(reps):
                        x = x * 0.9999 + 1e-7
                elif prim == "subred":
                    for _ in range(reps):
                        r = jnp.sum(x, axis=0)  # (128,)
                        x = x + r[None, :] * 1e-9
                elif prim == "lanered":
                    for _ in range(reps):
                        r = jnp.sum(x, axis=1, keepdims=True)  # (8,1)
                        x = x + r * 1e-9
                elif prim == "roll":
                    for _ in range(reps):
                        x = x * 0.9999 + pltpu.roll(x, 1, 0) * 1e-9
                elif prim == "vload":
                    for r_ in range(reps):
                        v = payload_ref[0, pl.ds(jbase, 8), r_ % NF]
                        x = x + v[:, None] * 1e-9  # (8,1) broadcast add
                elif prim == "bcastmul":
                    v = payload_ref[0, pl.ds(jbase, 8), 0][:, None]
                    for _ in range(reps):
                        x = x + v * row0 * 1e-9
            return (g + 1, x)

        def cond(st):
            return st[0] * GRP < n

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), x0))
        col_ref[:, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, K, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0))
        ],
    )

    def one(carry, _):
        bg = carry[None] * 1e-6
        (c,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((TT * REG_H, REG_W), jnp.float32)],
        )(counts, bg, payload)
        return c[0, 0], None

    @jax.jit
    def run(c0):
        return jax.lax.scan(one, c0, None, length=50)

    return run


PRIMS = ("vload", "bcastmul", "fma")
REPS = (1, 9)
fns = {(p, r): make_fn(p, r) for p in PRIMS for r in REPS}
# ops executed per rep per while-iteration: GRP//8 sub-groups
SUBS = GRP // 8
N_ITERS = TT * (256 // GRP)  # while iterations per call
for rep in range(2):
    for p in PRIMS:
        ts = {}
        for r in REPS:
            run = fns[(p, r)]
            c, _ = run(jnp.float32(rep))
            _ = float(np.asarray(c))
            t0 = time.time()
            c, _ = run(jnp.float32(rep + 5))
            _ = float(np.asarray(c))
            ts[r] = (time.time() - t0) / 50
        marg = (ts[REPS[1]] - ts[REPS[0]]) / (REPS[1] - REPS[0])
        per_op = marg / (N_ITERS * SUBS) * 1e9
        print(f"rep {rep} {p:9s}: t1={ts[1]*1e3:.3f} t9={ts[9]*1e3:.3f} ms "
              f"-> {per_op:6.2f} ns/op", flush=True)
print("done")

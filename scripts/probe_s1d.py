#!/usr/bin/env python
"""Round-3 S(1) probe, part 4: the backward reduction candidates.

probe_s1c E3 (ANY-space Pallas result -> slice -> scatter) still measured
3.6 ms, so either scatter-add is inherently serial at this volume or the
slice fused into the scatter.  Separate the hypotheses with lone ops
(every consumer is a matvec so nothing folds away — round-2 rule):

  F1  lone row scatter-add [T*K rows, NF] -> [P1, NF], no Pallas anywhere
  F5  lone row gather [T*K rows, NF], honest matvec consumer (D3 re-check)
  F3  lone i32 SET-scatter of T*K scalar elements (sort-inversion cost)
  F6  Pallas BlockSpec result -> optimization_barrier -> lone scatter-add
  F4  gather-formulation backward: mom[pos1].reshape(P,4,NF).sum(1)
      + mom[pos2].reshape(B,12,NF).sum(1) scattered at B rows
      (what the backward costs if the slot->gaussian scatter becomes
       tier-structured gathers; pos arrays are fwd-side binning ints)
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, NF, P = 256, 896, 8, 49152
B = 4096
TK = T * K
R = 20
f32 = jnp.float32

rng = np.random.default_rng(0)
mom_arg = jnp.asarray(rng.standard_normal((TK, NF)), f32)
gflat = jnp.asarray(rng.integers(0, P, (TK,)).astype(np.int32))
pos1 = jnp.asarray(rng.integers(0, TK, (P * 4,)).astype(np.int32))
pos2 = jnp.asarray(rng.integers(0, TK, (B * 12,)).astype(np.int32))
big_idx = jnp.asarray(rng.integers(0, P, (B,)).astype(np.int32))
w = jnp.asarray(rng.standard_normal((NF,)), f32)
counts = jnp.full((T,), K, jnp.int32)
bg = jnp.zeros((1,), f32)

GDN_ROW = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
SDN_ROW = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)
SDN_ELEM = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)
IB = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


def block_producer_kernel(counts_ref, bg_ref, o_ref):
    t = pl.program_id(0)
    v = jax.lax.broadcasted_iota(jnp.int32, (K, NF), 0).astype(f32)
    o_ref[0] = v + counts_ref[t].astype(f32)


def produce_block():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, K, NF), lambda t, c, b: (t, 0, 0)),
    )
    return pl.pallas_call(
        block_producer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, K, NF), f32),
    )(counts, bg)


def scanned(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return body(c, *args)

        _, ys = jax.lax.scan(step, jnp.int32(1), None, length=R)
        return ys

    return run


def f1_body(c, mom_arg, gflat, w):
    upd = jax.lax.optimization_barrier(mom_arg + c.astype(f32))
    acc = jax.lax.scatter_add(
        jnp.zeros((P + 8, NF), f32),
        jnp.minimum(gflat + c, P - 1)[:, None],
        upd,
        SDN_ROW,
        mode=IB,
    )
    acc = jax.lax.optimization_barrier(acc)
    return c + 1, ((acc @ w) ** 2).sum()


def f5_body(c, mom_arg, gflat, w):
    g = jax.lax.gather(
        mom_arg, jnp.minimum(gflat + c, TK - 1)[:, None], GDN_ROW, (1, NF),
        mode=IB,
    )
    g = jax.lax.optimization_barrier(g)
    return c + 1, ((g @ w) ** 2).sum()


def f3_body(c, gflat):
    iota = jax.lax.iota(jnp.int32, TK)
    inv = jax.lax.scatter(
        jnp.zeros((P + 8,), jnp.int32),
        jnp.minimum(gflat + c, P - 1)[:, None],
        iota,
        SDN_ELEM,
        mode=IB,
    )
    inv = jax.lax.optimization_barrier(inv)
    return c + 1, inv.sum()


def f6_body(c, gflat, w):
    mom = produce_block()
    upd = jax.lax.optimization_barrier(mom.reshape(TK, NF))
    acc = jax.lax.scatter_add(
        jnp.zeros((P + 8, NF), f32),
        jnp.minimum(gflat + c, P - 1)[:, None],
        upd,
        SDN_ROW,
        mode=IB,
    )
    acc = jax.lax.optimization_barrier(acc)
    return c + 1, ((acc @ w) ** 2).sum()


def f4_body(c, mom_arg, pos1, pos2, big_idx, w):
    mom = jax.lax.optimization_barrier(mom_arg + c.astype(f32))
    g1 = jax.lax.gather(
        mom, jnp.minimum(pos1 + c, TK - 1)[:, None], GDN_ROW, (1, NF), mode=IB
    )
    g1 = jax.lax.optimization_barrier(g1)
    d1 = g1.reshape(P, 4, NF).sum(axis=1)
    g2 = jax.lax.gather(
        mom, jnp.minimum(pos2 + c, TK - 1)[:, None], GDN_ROW, (1, NF), mode=IB
    )
    g2 = jax.lax.optimization_barrier(g2)
    d2 = g2.reshape(B, 12, NF).sum(axis=1)
    d2 = jax.lax.optimization_barrier(d2)
    acc = jax.lax.scatter_add(
        jnp.zeros((P, NF), f32).at[:, :].add(d1),
        big_idx[:, None],
        d2,
        SDN_ROW,
        mode=IB,
    )
    return c + 1, ((acc @ w) ** 2).sum()


def timeit(label, fn, *args):
    try:
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / 5 / R * 1e3
        print(f"{label:52s} {ms:8.3f} ms/step  (first {tc:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label:52s} FAILED: {type(e).__name__}: {e}", flush=True)


print(f"device: {jax.devices()[0]}", flush=True)
timeit("F1 lone row scatter-add [TK rows]", scanned(f1_body), mom_arg, gflat, w)
timeit("F5 lone row gather [TK rows] (matvec)", scanned(f5_body), mom_arg, gflat, w)
timeit("F3 lone i32 set-scatter [TK elems]", scanned(f3_body), gflat)
timeit("F6 pallas out -> barrier -> lone scatter", scanned(f6_body), gflat, w)
timeit("F4 tiered gather-formulation backward", scanned(f4_body),
       mom_arg, pos1, pos2, big_idx, w)
print("done", flush=True)

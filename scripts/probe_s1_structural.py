#!/usr/bin/env python
"""Structural S(1) fix candidates, measured in-scan at bench shapes.

Round-2 established (ROADMAP.md): gather/scatter fusions whose buffers are
Pallas-call operands/results get pinned to VMEM (S(1)) by XLA's memory-space
assignment and lower through a serial ~7-17 ns/row emitter; compiler flags
cannot turn this off (probe_msa_*.py).  This probe measures the structural
escapes, each inside a lax.scan (per-step numbers, dispatch amortized,
arrays passed as jit args per the round-2 contamination rule):

  A1  [T]-row window gather of the idx table (one K-slice per tile) + mask,
      XLA consumer             -- is a 256-row gather cheap even when fused?
  A2  same window gather feeding a Pallas SMEM-block consumer
                               -- does Pallas adjacency re-pin it?
  B1  [T*K]-row payload gather -> Pallas BlockSpec operand (fusion.587 repro,
      expect ~3.2 ms)
  B2  same gather -> Pallas with memory_space=ANY operand + in-kernel DMA
                               -- does an HBM operand escape the pinning?
  C1  Pallas BlockSpec result [T,K,8] -> scatter-add [P1,8] (fusion.594
      repro, expect ~3 ms)
  C2  Pallas ANY result (in-kernel DMA out) -> scatter-add
                               -- does an HBM result escape the pinning?

Scan bodies vary all indices with the carry and consume results
non-linearly (square-sum) so nothing hoists or folds (round-2 rule:
scatter->sum folds away).
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
NP = 245760  # static sorted-pair buffer length at the bench point
R = 20
f32 = jnp.float32

rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P + 8, NF)), f32)
sv_ext = jnp.asarray(rng.integers(0, P, (NP + 1,)).astype(np.int32))
starts = jnp.asarray(
    np.sort(rng.integers(0, NP - K, (T,))).astype(np.int32)
)
counts = jnp.asarray(rng.integers(1, K, (T,)).astype(np.int32))
tk_idx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
gflat = jnp.asarray(rng.integers(0, P, (T * K,)).astype(np.int32))
bg = jnp.zeros((1,), f32)


def window_gather(table, st, size):
    """table[st[i] : st[i]+size] for each i -> [len(st), size] (one gather
    row per START, not per element)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return jax.lax.gather(
        table, st[:, None], dn, (size,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# --- Pallas consumers/producers ------------------------------------------


def smem_consumer_kernel(counts_ref, bg_ref, idx_ref, o_ref):
    # touch a few SMEM entries (cheap, keeps the operand alive)
    s = idx_ref[0] + idx_ref[K // 2] + idx_ref[K - 1] + counts_ref[pl.program_id(0)]
    o_ref[...] = jnp.zeros((8, 128), f32) + s.astype(f32)


def consume_smem(idx):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((K,), lambda t, c, b: (t,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t, c, b: (t, 0)),
    )
    return pl.pallas_call(
        smem_consumer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), f32),
    )(counts, bg, idx.reshape(-1))


def vmem_consumer_kernel(counts_ref, bg_ref, pay_ref, o_ref):
    o_ref[...] = jnp.zeros((8, 128), f32) + jnp.sum(pay_ref[0])


def consume_block(pay):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, NF), lambda t, c, b: (t, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda t, c, b: (t, 0)),
    )
    return pl.pallas_call(
        vmem_consumer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), f32),
    )(counts, bg, pay)


def any_consumer_kernel(counts_ref, bg_ref, pay_hbm, o_ref, scr, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(pay_hbm.at[t], scr, sem)
    cp.start()
    cp.wait()
    o_ref[...] = jnp.zeros((8, 128), f32) + jnp.sum(scr[...])


def consume_any(pay):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda t, c, b: (t, 0)),
        scratch_shapes=[pltpu.VMEM((K, NF), f32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        any_consumer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), f32),
    )(counts, bg, pay)


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


def any_producer_kernel(counts_ref, bg_ref, o_hbm, scr, sem):
    t = pl.program_id(0)
    v = jax.lax.broadcasted_iota(jnp.int32, (K, NF), 0).astype(f32)
    scr[...] = v + counts_ref[t].astype(f32)
    cp = pltpu.make_async_copy(scr, o_hbm.at[t], sem)
    cp.start()
    cp.wait()


def produce_any():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((1, K, NF), f32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        any_producer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, K, NF), f32),
    )(counts, bg)


# --- scanned variants ------------------------------------------------------


def scanned(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return body(c, *args)

        _, ys = jax.lax.scan(step, jnp.int32(1), None, length=R)
        return ys

    return run


def a1_body(c, sv_ext, starts, counts):
    st = jnp.minimum(starts + c, NP - K)
    win = window_gather(sv_ext, st, K)  # [T, K]
    masked = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None], win, P
    )
    return c + 1, (masked.astype(f32) ** 2).sum()


def a2_body(c, sv_ext, starts, counts):
    st = jnp.minimum(starts + c, NP - K)
    win = window_gather(sv_ext, st, K)
    masked = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None], win, P
    )
    return c + 1, (consume_smem(masked) ** 2).sum()


def b1_body(c, fields, tk_idx):
    pay = fields[jnp.minimum(tk_idx + c, P - 1)]
    return c + 1, (consume_block(pay) ** 2).sum()


def b2_body(c, fields, tk_idx):
    pay = fields[jnp.minimum(tk_idx + c, P - 1)]
    return c + 1, (consume_any(pay) ** 2).sum()


def c1_body(c, gflat):
    mom = produce_block()
    acc = jnp.zeros((P + 8, NF), f32).at[
        jnp.minimum(gflat + c, P - 1)
    ].add(mom.reshape(-1, NF), mode="drop")
    return c + 1, (acc**2).sum()


def c2_body(c, gflat):
    mom = produce_any()
    acc = jnp.zeros((P + 8, NF), f32).at[
        jnp.minimum(gflat + c, P - 1)
    ].add(mom.reshape(-1, NF), mode="drop")
    return c + 1, (acc**2).sum()


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
        print(f"{label:44s} {ms:8.3f} ms/step  (first {tc:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 - probe must report and continue
        print(f"{label:44s} FAILED: {type(e).__name__}: {e}", flush=True)


print(f"device: {jax.devices()[0]}", flush=True)
timeit("A1 window-gather idx [T rows] -> XLA", scanned(a1_body), sv_ext, starts, counts)
timeit("A2 window-gather idx -> pallas SMEM", scanned(a2_body), sv_ext, starts, counts)
timeit("B1 payload gather -> pallas BlockSpec", scanned(b1_body), fields, tk_idx)
timeit("B2 payload gather -> pallas ANY+DMA", scanned(b2_body), fields, tk_idx)
timeit("C1 pallas BlockSpec out -> scatter-add", scanned(c1_body), gflat)
timeit("C2 pallas ANY+DMA out -> scatter-add", scanned(c2_body), gflat)
print("done", flush=True)

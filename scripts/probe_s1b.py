#!/usr/bin/env python
"""Round-3 S(1) probe, part 2: window-op insulation of the big gathers.

probe_s1_structural.py showed: a [T]-row window gather is ~free (A1), the
[T*K]-row scatter consuming a Pallas result costs 3.5 ms (C1), and the
ANY+DMA escapes fail to compile at NF=8 minor dims (Mosaic 128-lane tiling).

New hypothesis: compose the payload movement as
    fields -[row_gather(sv), NP rows]-> pair_fields
           -[window_gather(starts), T rows]-> payload -> Pallas
and its transpose
    Pallas -> dpay -[window_scatter(starts), T rows]-> dpairs
           -[row_scatter(sv), NP rows]-> dfields.
The T-row window op is the only Pallas-adjacent op (cheap even if VMEM-
pinned); the NP-row ops sit one buffer away and should ride the DMA
engine — IF memory-space assignment does not propagate the pinning
through the window op's operand.  Measure exactly that:

  D3  lone row_gather (NP rows), in scan, XLA consumer        (control)
  D4  lone row_scatter-add (NP rows -> P1), in scan, XLA      (control)
  D1  row_gather -> window_gather -> Pallas BlockSpec operand
  D2  Pallas BlockSpec result -> window_scatter -> row_scatter-add
  A2b window-gathered idx (padded to K=1024) -> Pallas SMEM operand
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
KP = 1024  # SMEM rank-1 block tiling
NP = 245760
R = 20
f32 = jnp.float32

rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P + 8, NF)), f32)
sv = jnp.asarray(rng.integers(0, P, (NP + K,)).astype(np.int32))
starts = jnp.asarray(np.sort(rng.integers(0, NP - K, (T,))).astype(np.int32))
counts = jnp.asarray(rng.integers(1, K, (T,)).astype(np.int32))
bg = jnp.zeros((1,), f32)

GDN_ROW = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
GDN_WIN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
)
SDN_WIN = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1, 2),
    inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,),
)
SDN_ROW = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)
IB = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


def row_gather(tab, idx):
    return jax.lax.gather(tab, idx[:, None], GDN_ROW, (1, NF), mode=IB)


def window_gather(tab, st):
    return jax.lax.gather(tab, st[:, None], GDN_WIN, (K, NF), mode=IB)


def window_scatter_add(ops, st, upd):
    return jax.lax.scatter_add(ops, st[:, None], upd, SDN_WIN, mode=IB)


def row_scatter_add(ops, idx, upd):
    return jax.lax.scatter_add(ops, idx[:, None], upd, SDN_ROW, mode=IB)


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


def smem_consumer_kernel(counts_ref, bg_ref, idx_ref, o_ref):
    s = idx_ref[0] + idx_ref[KP // 2] + idx_ref[KP - 1] + counts_ref[pl.program_id(0)]
    o_ref[...] = jnp.zeros((8, 128), f32) + s.astype(f32)


def consume_smem(idx):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((KP,), lambda t, c, b: (t,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t, c, b: (t, 0)),
    )
    return pl.pallas_call(
        smem_consumer_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), f32),
    )(counts, bg, idx.reshape(-1))


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


def d3_body(c, fields, sv):
    pf = row_gather(fields, jnp.minimum(sv + c, P - 1))
    return c + 1, (pf**2).sum()


def d4_body(c, fields, sv):
    upd = fields[:NP] * c  # cheap varying updates (elementwise, no gather)
    acc = row_scatter_add(
        jnp.zeros((P + 8, NF), f32), jnp.minimum(sv[:NP] + c, P - 1), upd
    )
    return c + 1, (acc**2).sum()


def d1_body(c, fields, sv, starts):
    pf = row_gather(fields, jnp.minimum(sv + c, P - 1))
    pay = window_gather(pf, starts)
    return c + 1, (consume_block(pay) ** 2).sum()


def d2_body(c, fields, sv, starts):
    mom = produce_block()
    dpairs = window_scatter_add(jnp.zeros((NP + K, NF), f32), starts, mom)
    acc = row_scatter_add(
        jnp.zeros((P + 8, NF), f32),
        jnp.minimum(sv[:NP] + c, P - 1),
        dpairs[:NP],
    )
    return c + 1, (acc**2).sum()


def a2b_body(c, sv, starts, counts):
    st = jnp.minimum(starts + c, NP - K)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    win = jax.lax.gather(sv, st[:, None], dn, (KP,), mode=IB)
    masked = jnp.where(
        jnp.arange(KP, dtype=jnp.int32)[None, :] < counts[:, None], win, P
    )
    return c + 1, (consume_smem(masked) ** 2).sum()


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
timeit("D3 lone row_gather [NP rows], XLA", scanned(d3_body), fields, sv)
timeit("D4 lone row_scatter-add [NP rows], XLA", scanned(d4_body), fields, sv)
timeit("D1 row_gather -> window_gather -> pallas", scanned(d1_body), fields, sv, starts)
timeit("D2 pallas -> window_scatter -> row_scatter", scanned(d2_body), fields, sv, starts)
timeit("A2b window idx (KP=1024) -> pallas SMEM", scanned(a2b_body), sv, starts, counts)
print("done", flush=True)

#!/usr/bin/env python
"""Round-3 S(1) probe, part 3: ANY-space (HBM) Pallas operands/results.

probe_s1_structural/probe_s1b established: any XLA gather/scatter whose
buffer is Pallas-adjacent serializes (~0.5-2.5 ns/element), lone gathers
in-scan ride the DMA engine (0.002 ms), and window-op insulation does not
break the adjacency propagation.  Hypothesis: operands/results declared
memory_space=ANY live in HBM, so the adjacent gather/scatter stays a lone
HBM-to-HBM op (DMA) and the kernel moves blocks itself with make_async_copy.
Mosaic requires ANY-space slices be 128-aligned on the minor dim; the
payload [T,K,8] bitcast-reshapes for free to [T,K/16,128] (16 slots x 8
fields per row; in-kernel scalar reads keep a STATIC lane because
j %% 16 == c %% 16 for unrolled instance offset c when CHUNK %% 16 == 0).

  E0  raw arg [T,K,8]      -> pallas BlockSpec consume   (staging control)
  E1  raw arg [T,KP] int32 -> pallas SMEM consume        (staging control)
  E3  pallas ANY result [T,K,128] (in-kernel DMA out) -> slice ->
      row_scatter-add                                    (backward escape)
  E7  row_gather -> reshape [T,K/16,128] -> pallas ANY operand
      (in-kernel DMA in + static-lane scalar reads)      (forward escape)
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
KP = 1024
R = 20
f32 = jnp.float32

rng = np.random.default_rng(0)
fields = jnp.asarray(rng.standard_normal((P + 8, NF)), f32)
tk_idx = jnp.asarray(rng.integers(0, P, (T, K)).astype(np.int32))
idx_smem = jnp.asarray(rng.integers(0, P, (T, KP)).astype(np.int32))
pay_arg = jnp.asarray(rng.standard_normal((T, K, NF)), f32)
gflat = jnp.asarray(rng.integers(0, P, (T * K,)).astype(np.int32))
counts = jnp.asarray(rng.integers(1, K, (T,)).astype(np.int32))
bg = jnp.zeros((1,), f32)

GDN_ROW = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)
SDN_ROW = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)
IB = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


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


def any_producer128_kernel(counts_ref, bg_ref, o_hbm, scr, sem):
    t = pl.program_id(0)
    v = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 0).astype(f32)
    scr[...] = v + counts_ref[t].astype(f32)
    cp = pltpu.make_async_copy(scr, o_hbm.at[t], sem)
    cp.start()
    cp.wait()


def produce_any128():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((K, 128), f32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        any_producer128_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, K, 128), f32),
    )(counts, bg)


def any_consumer16_kernel(counts_ref, bg_ref, pay_hbm, o_ref, scr, sem):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(pay_hbm.at[t], scr, sem)
    cp.start()
    cp.wait()
    # static-lane scalar reads: instance j = 16*s + c -> row s, lane 8*c + f
    acc = jnp.zeros((8, 128), f32)
    for c in range(16):
        for f in range(2):  # touch a subset (probe: staging cost, not VPU)
            acc = acc + scr[3, 8 * c + f]
    o_ref[...] = acc


def consume_any16(pay16):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda t, c, b: (t, 0)),
        scratch_shapes=[pltpu.VMEM((K // 16, 128), f32), pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        any_consumer16_kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), f32),
    )(counts, bg, pay16)


def scanned(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return body(c, *args)

        _, ys = jax.lax.scan(step, jnp.int32(1), None, length=R)
        return ys

    return run


def e0_body(c, pay_arg):
    return c + 1, (consume_block(pay_arg * 1.0) ** 2).sum() + c.astype(f32) * 0


def e0b_body(c, pay_arg):
    # arg passed through elementwise op varying with c (forces per-step use)
    return c + 1, (consume_block(pay_arg + c.astype(f32)) ** 2).sum()


def e1_body(c, idx_smem):
    return c + 1, (consume_smem(jnp.minimum(idx_smem + c, P - 1)) ** 2).sum()


def e3_body(c, fields, gflat):
    mom = produce_any128()
    mom8 = mom[:, :, :NF]
    acc = jax.lax.scatter_add(
        jnp.zeros((P + 8, NF), f32),
        jnp.minimum(gflat + c, P - 1)[:, None],
        mom8.reshape(T * K, NF),
        SDN_ROW,
        mode=IB,
    )
    return c + 1, (acc**2).sum()


def e7_body(c, fields, tk_idx):
    pay = jax.lax.gather(
        fields,
        jnp.minimum(tk_idx + c, P - 1).reshape(-1, 1),
        GDN_ROW,
        (1, NF),
        mode=IB,
    )  # [T*K, NF]
    pay16 = pay.reshape(T, K // 16, 128)
    return c + 1, (consume_any16(pay16) ** 2).sum()


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
timeit("E0 arg*1 -> pallas BlockSpec consume", scanned(e0_body), pay_arg)
timeit("E0b arg+c -> pallas BlockSpec consume", scanned(e0b_body), pay_arg)
timeit("E1 arg idx -> pallas SMEM consume", scanned(e1_body), idx_smem)
timeit("E3 pallas ANY out [T,K,128] -> slice+scatter", scanned(e3_body), fields, gflat)
timeit("E7 gather -> [T,K/16,128] -> pallas ANY in", scanned(e7_body), fields, tk_idx)
print("done", flush=True)

#!/usr/bin/env python
"""Round-3 S(1) probe, part 5: in-kernel per-Gaussian RMW accumulation.

Every XLA-side reduction of a Pallas result serializes (probe_s1d, r3
traces), so the slot->Gaussian gradient reduction must happen INSIDE the
backward kernel.  Plan: a persistent VMEM accumulator [P1/16, 128]
(gaussian g -> row g//16, lanes 8*(g%16)..+8), updated per instance with an
(8,128) slab read-modify-write at 8-aligned base (g//128)*8, with the
lane/sublane placement done by VECTOR MASKS (data-dependent masks are legal;
only dynamic ADDRESSING is constrained).  Gaussian ids ride a spare payload
lane as bitcast f32.

Risk: Mosaic cannot prove dynamic slabs disjoint, so consecutive RMWs may
serialize on VMEM latency.  Variants measure that and the parity-split
mitigation:

  G0  moment-style kernel: per-group rows written to a [T, K, 8] BlockSpec
      result + the XLA scatter-add it implies         (status quo shape)
  G1  RMW accumulator, single buffer
  G2  RMW accumulator, 2 parity buffers (adjacent instances independent)
  G4  RMW accumulator, 4 parity buffers

Each kernel does the same toy per-instance math; correctness of G1 is
checked against a numpy accumulation before timing.
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
PR = 3080  # ceil(49160/16) rounded to a multiple of 8
R = 20
CH = 8  # instances per group
f32 = jnp.float32

rng = np.random.default_rng(0)
pay_np = rng.standard_normal((T, K, NF)).astype(np.float32)
gid_np = rng.integers(0, P, (T, K)).astype(np.int32)
pay = jnp.asarray(pay_np)
gflat = jnp.asarray(gid_np.reshape(-1))
gid_pad = jnp.asarray(
    np.concatenate([gid_np, np.zeros((T, KP - K), np.int32)], 1)
)
counts = jnp.full((T,), K, jnp.int32)
bg = jnp.zeros((1,), f32)

SDN_ROW = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,),
    inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)
IB = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


def _rows128(pay_ref, g):
    """Toy per-group moment rows: (CH, 128), lane l holds 'moment' l%8 of
    instance (sublane).  Mimics the moment kernel's finish cost."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
    rows = jnp.zeros((CH, 128), f32)
    for k in range(6):
        col = sum(
            pay_ref[0, g * CH + i, k] *
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 0) == i, 1.0, 0.0
            )
            for i in range(CH)
        )
        rows = rows + jnp.where(lane % 8 == k, col, 0.0)
    return rows


def k_block(counts_ref, bg_ref, pay_ref, out_ref):
    n = counts_ref[pl.program_id(0)]

    def body(g, _):
        rows = _rows128(pay_ref, g)
        off = pl.multiple_of(g * CH, CH)
        out_ref[0, pl.ds(off, CH), :] = rows[:, :NF]
        return 0

    jax.lax.fori_loop(0, n // CH, body, 0)


def make_rmw_kernel(nbuf: int):
    def kernel(counts_ref, bg_ref, gid_ref, pay_ref, out_ref, *accs):
        t = pl.program_id(0)
        n = counts_ref[t]
        sub = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 0)
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1) // 8

        @pl.when(t == 0)
        def _init():
            for a in accs:
                a[...] = jnp.zeros(a.shape, f32)

        def body(g, _):
            rows = _rows128(pay_ref, g)
            for i in range(CH):
                gid = gid_ref[g * CH + i]
                base = pl.multiple_of((gid // 128) * 8, 8)
                m = (lane16 == gid % 16) & (sub == (gid // 16) % 8)
                val = jnp.where(m, jnp.broadcast_to(rows[i : i + 1], (CH, 128)), 0.0)
                a = accs[i % nbuf]
                a[pl.ds(base, CH), :] = a[pl.ds(base, CH), :] + val
            return 0

        jax.lax.fori_loop(0, n // CH, body, 0)

        @pl.when(t == pl.num_programs(0) - 1)
        def _emit():
            total = accs[0][...]
            for a in accs[1:]:
                total = total + a[...]
            out_ref[...] = total

    return kernel


def run_block(pay):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, NF), lambda t, c, b: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, K, NF), lambda t, c, b: (t, 0, 0)),
    )
    mom = pl.pallas_call(
        k_block, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, K, NF), f32),
    )(counts, bg, pay)
    return jnp.zeros((P + 16, NF), f32).at[gflat].add(
        mom.reshape(-1, NF), mode="drop"
    )


def run_rmw(pay, nbuf):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((KP,), lambda t, c, b: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, NF), lambda t, c, b: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((PR, 128), lambda t, c, b: (0, 0)),
        scratch_shapes=[pltpu.VMEM((PR, 128), f32) for _ in range(nbuf)],
    )
    acc = pl.pallas_call(
        make_rmw_kernel(nbuf), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((PR, 128), f32),
    )(counts, bg, gid_pad.reshape(-1), pay)
    return acc.reshape(PR * 16, 8)


def scanned(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return body(c, *args)

        _, ys = jax.lax.scan(step, jnp.int32(1), None, length=R)
        return ys

    return run


def _perturb(pay, c):
    # vary the input per scan step (prevents CSE/hoisting of the pallas call)
    return pay + c.astype(f32) * 1e-7


def g0_body(c, pay):
    return c + 1, (run_block(_perturb(pay, c)) ** 2).sum()


def make_g_body(nbuf):
    def body(c, pay):
        return c + 1, (run_rmw(_perturb(pay, c), nbuf) ** 2).sum()

    return body


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
# correctness of the RMW layout vs numpy accumulation
try:
    got = np.asarray(run_rmw(pay, 1))[: P + 16]
    want = np.zeros((P + 16, NF), np.float32)
    mom = np.zeros((T, K, NF), np.float32)
    for k in range(6):
        mom[:, :, k] = pay_np[:, :, k]
    np.add.at(want, gid_np.reshape(-1), mom.reshape(-1, NF))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"RMW correctness vs numpy: rel err {err:.2e}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"RMW correctness check FAILED: {type(e).__name__}: {e}", flush=True)

timeit("G0 block store + XLA scatter", scanned(g0_body), pay)
timeit("G1 RMW accumulator x1", scanned(make_g_body(1)), pay)
timeit("G2 RMW accumulator x2 parity", scanned(make_g_body(2)), pay)
timeit("G4 RMW accumulator x4 parity", scanned(make_g_body(4)), pay)
print("done", flush=True)

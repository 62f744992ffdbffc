#!/usr/bin/env python
"""Attribute the fwd blend kernel's ~17 ns/instance to loads / exp / chain.

Round-4 finding: cutting fast_exp from ~14 ops to 5 (FAST_EXP_CHEAP) moved
the full step only ~1% — the kernel is NOT ALU-bound.  This probe times
standalone variants of the train-config fwd kernel on the REAL bench
payload, all with early-exit removed (identical trip counts), interleaved
in one process:

  full    — replica of _make_fwd_kernel(False, False, True)
  noexp   — exp replaced by 1 + 1e-9*power (keeps loads + quadratic)
  noload  — 6 scalar payload loads replaced by j-derived scalars
  nochain — T/act/live composite replaced by acc += ag
  noexp_noload — both cuts

Dispatch latency is ~1 ms/call once contaminated, so each measurement is
a 50-iteration lax.scan with a carry->bg data dependence (no hoisting:
each call consumes the previous call's output).
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

from curve_gaussian_tpu.config import PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops import rasterize_pallas as RP
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_pallas import (
    REG_H, REG_W, field_layout, stack_fields,
)
from curve_gaussian_tpu.ops.rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

H = W = 512
n_views = 4
cams = synthetic.ring_cameras(n_views, H, W)
rng = np.random.default_rng(0)
seed_pts = synthetic.grid_seed_points(15)
pipe_cfg = PipelineConfig()
state_r = cs.init_state(seed_pts, n_views=n_views, n_gaussians=12)
gsr = cs.gaussians(state_r)
cam0 = cams[0]
pre = jax.jit(
    lambda: preprocess(
        gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], cam0,
        alive=gsr["alive"],
    )
)()
_ = float(np.asarray(pre.mean2d)[0, 0])
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)

bin_out = jax.jit(
    lambda: B.bin_gaussians(pre, H, W, capacity=pipe_cfg.tile_capacity)
)()
fl = jax.jit(
    lambda: stack_fields(pre, col, amz, geo=False, invd=False, ones=True)
)()
payload = jax.jit(lambda: B.row_gather(fl, bin_out.gather_idx))()
counts = bin_out.counts
_ = float(np.asarray(payload)[0, 0, 0])
K = payload.shape[1]
NF = payload.shape[2]
TT = nty * ntx
L, _ = field_layout(False, False, True)
print(f"payload [{TT},{K},{NF}], real instances {int(np.asarray(counts).sum())}",
      flush=True)

GRP, PIPE = RP._FWD_CHUNK, RP._PIPE


def make_kernel(variant: str, kwin: int = None):
    noexp = "noexp" in variant
    noload = "noload" in variant
    nochain = "nochain" in variant
    empty = "empty" in variant
    noquad = "noquad" in variant
    const = "const" in variant
    manyvec = "manyvec" in variant

    def kernel(counts_ref, bg_ref, payload_ref, col_ref, t_ref):
        fdt = payload_ref.dtype
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        n = counts_ref[ty * pl.num_programs(1) + tx]
        if kwin is not None:
            n = jnp.minimum(n, kwin)
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        is_ = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 0)
        p = is_ * REG_W + il
        px = (tx * 32 + p % 32).astype(fdt)
        py = (ty * 32 + p // 32).astype(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        one = zero + 1.0

        def phase1(j):
            if const:
                # ZERO scalar-unit work, one vector op: isolates the
                # scalar addressing/splat cost when compared to `empty`
                return one * 1e-5
            if manyvec:
                # ~30 chained vector FMAs seeded by ONE scalar op (the j
                # dependence defeats CSE across the unrolled sub-group):
                # measures the VPU throughput this loop structure can
                # actually retire
                v = px * 1e-6 + (j & 7).astype(fdt) * 1e-9
                for _ in range(15):
                    v = v * 0.9999 + py * 1e-9
                return v
            if empty:
                # one vector op per instance: the loop/iteration floor
                return zero + (j & 7).astype(fdt) * 1e-5
            if noload:
                base = (j & 7).astype(fdt)
                mx = 200.0 + base
                my = 200.0 - base
                ca = 0.01 + base * 1e-4
                cb = base * 1e-5
                cc = 0.01
                opa = 0.3 + base * 0.0
            else:
                gf = lambda f: payload_ref[0, j, f]
                mx, my = gf(L["mx"]), gf(L["my"])
                ca, cb, cc = gf(L["ca"]), gf(L["cb"]), gf(L["cc"])
                opa = gf(L["opa"])
            dx = mx - px
            dy = my - py
            if noquad:
                power = (dx + dy) * -1e-3
            else:
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            if noexp:
                G = 1.0 + power * 1e-9
            else:
                G = RP.fast_exp_bits(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            return jnp.where(cand, alpha, zero)

        def group_cond(st):
            g, state = st
            return g * GRP < n  # NO early exit: equal trips across variants

        def group_body(st):
            g, state = st
            T_, act, acc = state
            for s in range(GRP // PIPE):
                pre_a = [phase1(g * GRP + s * PIPE + i) for i in range(PIPE)]
                if nochain:
                    acc = acc + sum(pre_a)
                else:
                    ws = []
                    for ag in pre_a:
                        aT = ag * T_
                        ta = T_ - aT
                        live = jnp.where(ta >= T_EPS, one, zero)
                        w = aT * (act * live)
                        act = act * jnp.where(ag > 0.0, live, one)
                        T_ = T_ - w
                        ws.append(w)
                    acc = acc + sum(ws)
            return (g + 1, (T_, act, acc))

        init = (one, one, zero)
        _, (T_, _, acc) = jax.lax.while_loop(
            group_cond, group_body, (jnp.int32(0), init)
        )
        col_ref[:, :] = acc + T_ * bg_ref[0]
        t_ref[:, :] = T_

    return kernel


def make_fn(variant: str, kwin: int = None):
    kern = make_kernel(variant, kwin)
    KB = K if kwin is None else kwin
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((1, KB, NF), lambda i, j, c, b: (i * ntx + j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
            pl.BlockSpec((REG_H, REG_W), lambda i, j, c, b: (i * ntx + j, 0)),
        ],
    )

    def one(carry, _):
        bg = carry[None] * 0.0
        c, t = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((TT * REG_H, REG_W), jnp.float32),
                jax.ShapeDtypeStruct((TT * REG_H, REG_W), jnp.float32),
            ],
        )(counts, bg, payload[:, :KB])
        return c[0, 0], t[0, 0]

    @jax.jit
    def run(c0):
        c, ts = jax.lax.scan(one, c0, None, length=50)
        return c, ts

    return run


# (variant, kwin): kwin clamps n AND the DMA'd block — if the grid-step
# cost is DMA-proportional, the small-block runs drop by the DMA delta
VARIANTS = (("full", 256), ("full", 128), ("full", 64), ("const_nochain", 256),
            ("const_nochain", 64), ("full", 256))
fns = {v: make_fn(*v) for v in set(VARIANTS)}
for rep in range(3):
    for v in VARIANTS:
        run = fns[v]
        c, ts = run(jnp.float32(rep))
        _ = float(np.asarray(c))  # sync by value
        t0 = time.time()
        c, ts = run(jnp.float32(rep + 10))
        _ = float(np.asarray(c))
        dt = (time.time() - t0) / 50 * 1e3
        print(f"rep {rep} {str(v):24s}: {dt:.3f} ms/call", flush=True)
print("done")

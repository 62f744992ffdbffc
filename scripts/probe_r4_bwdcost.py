#!/usr/bin/env python
"""Attribute the paired moment-RMW backward kernel's per-instance cost.

Variants (each removes ONE stage, same trip counts — early exit removed):
  full      — replica of _make_bwd_moment_rmw_paired (diet signature)
  nocomb    — skip the MXU combiner + RMW (rowsg from phase-state consts)
  normw     — combiner kept, per-instance slab RMW skipped
  nostores  — the six per-instance scratch stores skipped (combiner reads
              whatever is resident; values garbage, timing valid)
  noload    — payload scalar loads replaced by j-derived scalars
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
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops import rasterize_pallas as RP
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_pallas import (
    REG_H, REG_W, _KP, _acc_rows, field_layout, stack_fields,
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
idx_flat = bin_out.idx_pad.reshape(-1)
_ = float(np.asarray(payload)[0, 0, 0])
TT = nty * ntx
K = payload.shape[1]
NF = payload.shape[2]
P1 = fl.shape[0]
PR = _acc_rows(P1)
L, _ = field_layout(False, False, True)
grp = 32
rngj = np.random.default_rng(1)
gc_img = jnp.asarray(rngj.normal(size=(TT * REG_H, REG_W)) * 1e-4, jnp.float32)
binv_img = jnp.asarray(rngj.normal(size=(TT * REG_H, REG_W)) * 1e-4, jnp.float32)
print(f"payload [{TT},{K},{NF}], P1={P1}, PR={PR}", flush=True)


def make_kernel(variant: str):
    nocomb = "nocomb" in variant
    normw = "normw" in variant
    nostores = "nostores" in variant
    noload = "noload" in variant
    nodiv = "nodiv" in variant
    fastrecip = "fastrecip" in variant

    def recip(d):
        if nodiv:
            return 2.0 - d  # structurally similar 1-op stand-in
        if fastrecip:
            bits = jax.lax.bitcast_convert_type(d, jnp.int32)
            x0 = jax.lax.bitcast_convert_type(
                jnp.int32(0x7EF127EA) - bits, jnp.float32
            )
            x0 = x0 * (2.0 - d * x0)
            x0 = x0 * (2.0 - d * x0)
            return x0
        return 1.0 / d

    def kernel(counts_ref, bg_ref, idx_ref, payload_ref,
               gc_ref, binv_ref, acc_out_ref, scr_ref, acc_ref):
        fdt = payload_ref.dtype
        ty = pl.program_id(0)
        tj = pl.program_id(1)
        ntxl = pl.num_programs(1) * 2
        t = ty * pl.num_programs(1) + tj
        ta = ty * ntxl + 2 * tj
        n = jnp.maximum(counts_ref[ta], counts_ref[ta + 1])
        il = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 1)
        is_ = jax.lax.broadcasted_iota(jnp.int32, (REG_H, REG_W), 0)
        p = is_ * REG_W + il
        pxa = ((2 * tj) * 32 + p % 32).astype(fdt)
        pxb = pxa + 32.0
        py = (ty * 32 + p // 32).astype(fdt)
        zero = jnp.zeros((REG_H, REG_W), fdt)
        one = zero + 1.0
        gcA = gc_ref[0:REG_H, :]
        gcB = gc_ref[REG_H : 2 * REG_H, :]
        base_invA = binv_ref[0:REG_H, :]
        base_invB = binv_ref[REG_H : 2 * REG_H, :]

        @pl.when(t == 0)
        def _init():
            acc_ref[...] = jnp.zeros(acc_ref.shape, fdt)

        rows_per = grp * REG_H
        half = 6 * rows_per
        gi = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (grp, rows_per), 1)
        S = jnp.where(ri // REG_H == gi, 1.0, 0.0).astype(fdt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (grp, 128), 1)
        lane_m8 = lane % 8
        zrowg = jnp.zeros((grp, 128), fdt)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        slabpos = sub8 * 16 + lane8 // 8
        zslab = jnp.zeros((8, 128), fdt)

        def phase1(q, j, px):
            if noload:
                base = (j & 7).astype(fdt)
                ca = 0.01 + base * 1e-4
                cb = base * 1e-5
                cc = 0.01
                opa = 0.3 + base * 0.0
                mx = 200.0 + base
                my = 200.0 - base
            else:
                gf = lambda f: payload_ref[q, j, f]
                ca, cb, cc = gf(L["ca"]), gf(L["cb"]), gf(L["cc"])
                opa = gf(L["opa"])
                mx, my = gf(L["mx"]), gf(L["my"])
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = RP.fast_exp_bits(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * G)
            cand = (power <= 0.0) & (alpha >= ALPHA_EPS)
            ag = jnp.where(cand, alpha, zero)
            return ag, G, dx, dy

        def group_cond(st):
            g, state = st
            return g * grp < n

        def group_body(st):
            g, state = st
            (Ta, actA, prA, Tb, actB, prB) = state
            for s in range(grp // 4):
                pa = [phase1(0, g * grp + s * 4 + i, pxa) for i in range(4)]
                pb = [phase1(1, g * grp + s * 4 + i, pxb) for i in range(4)]
                for i in range(4):
                    ii = s * 4 + i
                    agA, GA, dxA, dyA = pa[i]
                    aT = agA * Ta
                    rem = Ta - aT
                    liveA = jnp.where(rem >= T_EPS, one, zero)
                    wA = aT * (actA * liveA)
                    actA = actA * jnp.where(agA > 0.0, liveA, one)
                    TiA = Ta
                    Ta = Ta - wA
                    prA = prA + gcA * wA
                    inv1a = recip(1.0 - agA)
                    gal = gcA * TiA + inv1a * (base_invA + prA)
                    gal = gal * jnp.where(wA > 0.0, one, zero)
                    DpA = gal * GA
                    e1 = DpA * dxA
                    e2 = DpA * dyA
                    if not nostores:
                        for k, v in enumerate(
                            (DpA, e1, e2, e1 * dxA, e1 * dyA, e2 * dyA)
                        ):
                            scr_ref[
                                pl.ds(rows_per * k + REG_H * ii, REG_H), :
                            ] = v
                    agB, GB, dxB, dyB = pb[i]
                    bT = agB * Tb
                    remb = Tb - bT
                    liveB = jnp.where(remb >= T_EPS, one, zero)
                    wB = bT * (actB * liveB)
                    actB = actB * jnp.where(agB > 0.0, liveB, one)
                    TiB = Tb
                    Tb = Tb - wB
                    prB = prB + gcB * wB
                    inv1b = recip(1.0 - agB)
                    galb = gcB * TiB + inv1b * (base_invB + prB)
                    galb = galb * jnp.where(wB > 0.0, one, zero)
                    DpB = galb * GB
                    f1 = DpB * dxB
                    f2 = DpB * dyB
                    if not nostores:
                        for k, v in enumerate(
                            (DpB, f1, f2, f1 * dxB, f1 * dyB, f2 * dyB)
                        ):
                            scr_ref[
                                pl.ds(half + rows_per * k + REG_H * ii, REG_H),
                                :,
                            ] = v
            state = (Ta, actA, prA, Tb, actB, prB)
            off = g * grp
            if nocomb:
                return (g + 1, state)
            for q in range(2):
                rowsg = zrowg
                for k in range(6):
                    blk = scr_ref[
                        pl.ds(q * half + rows_per * k, rows_per), :
                    ]
                    Ak = jax.lax.dot_general(
                        S, blk, (((1,), (0,)), ((), ())),
                        preferred_element_type=fdt,
                    )
                    colr = jnp.sum(Ak, axis=1, keepdims=True)
                    rowsg = rowsg + jnp.where(lane_m8 == k, colr, zrowg)
                if normw:
                    # park the group sums in scratch instead of the RMW
                    scr_ref[pl.ds(0, grp), 0:128] = rowsg
                    continue
                for i in range(grp):
                    gid = idx_ref[q * _KP + off + i]
                    bs = pl.multiple_of((gid // 128) * 8, 8)
                    val = jnp.where(
                        slabpos == gid % 128,
                        jnp.broadcast_to(rowsg[i : i + 1], (8, 128)),
                        zslab,
                    )
                    acc_ref[pl.ds(bs, 8), :] = (
                        acc_ref[pl.ds(bs, 8), :] + val
                    )
            return (g + 1, state)

        init = (one, one, zero, one, one, zero)
        jax.lax.while_loop(group_cond, group_body, (jnp.int32(0), init))
        last = pl.num_programs(0) * pl.num_programs(1) - 1

        @pl.when(t == last)
        def _emit():
            acc_out_ref[...] = acc_ref[...]

    return kernel


def make_fn(variant: str):
    kern = make_kernel(variant)
    ntp = ntx // 2
    img2 = lambda: pl.BlockSpec(
        (2 * REG_H, REG_W), lambda i, j, c, b: (i * ntp + j, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntp),
        in_specs=[
            pl.BlockSpec(
                (2 * _KP,), lambda i, j, c, b: (i * ntp + j,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((2, K, NF), lambda i, j, c, b: (i * ntp + j, 0, 0)),
            img2(), img2(),
        ],
        out_specs=[pl.BlockSpec((PR, 128), lambda i, j, c, b: (0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2 * 6 * grp * REG_H, REG_W), jnp.float32),
            pltpu.VMEM((PR, 128), jnp.float32),
        ],
    )

    def one(carry, _):
        bg = carry[None] * 0.0
        (acc,) = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((PR, 128), jnp.float32)],
        )(counts, bg, idx_flat, payload, gc_img + carry * 0.0, binv_img)
        return acc[0, 0], acc[1, 1]

    @jax.jit
    def run(c0):
        return jax.lax.scan(one, c0, None, length=50)

    return run


VARIANTS = ("full", "nodiv", "fastrecip", "nodiv", "full", "fastrecip")
fns = {v: make_fn(v) for v in set(VARIANTS)}
for rep in range(3):
    for v in VARIANTS:
        run = fns[v]
        c, _ = run(jnp.float32(rep))
        _ = float(np.asarray(c))
        t0 = time.time()
        c, _ = run(jnp.float32(rep + 10))
        _ = float(np.asarray(c))
        dt = (time.time() - t0) / 50 * 1e3
        print(f"rep {rep} {v:10s}: {dt:.3f} ms/call", flush=True)
print("done")

#!/usr/bin/env python
"""Probe: sweep MSA/scoped-VMEM compiler_options on the bench-point raster grad.

The train-step trace (ROADMAP.md) shows the payload gather / grad scatter /
idx-table fusions around the Pallas blend calls lowered with S(1) (VMEM)
outputs through a ~15 ns/row serial emitter — 7.9 ms of the 16.6 ms step —
while identical HLO isolated runs at DMA speed.  This sweeps every plausible
memory-space-assignment off-switch found in libtpu's flag table (vf = v5
prefix; gf/jf measured no-op on this chip) against the SAME jitted raster
grad in ONE process, so per-process dispatch contamination cancels across
variants.  Also times the indirect flavor (structurally no payload gather)
at the same point, and re-times the baseline at the end to expose any
contamination drift.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops.projection import preprocess
from curve_gaussian_tpu.ops.rasterize_pallas import (
    build_payload,
    stack_fields,
    tile_blend,
    tile_blend_indirect,
    untile_image,
)

H = W = 512
cams = synthetic.ring_cameras(4, H, W)
rng = np.random.default_rng(0)
gt0 = jnp.asarray(rng.uniform(size=(H, W)) ** 4, jnp.float32)
seed_pts = synthetic.grid_seed_points(15)
state_r = cs.init_state(seed_pts, n_views=4, n_gaussians=12)
gsr = cs.gaussians(state_r)
pre = jax.jit(
    lambda x, s, q, o, a: preprocess(x, s, q, o, cams[0], alive=a)
)(gsr["xyz"], gsr["scale"], gsr["quat"], gsr["opacity"], gsr["alive"])
jax.block_until_ready(pre)
nty, ntx = B.tile_grid(H, W)
col = jnp.ones_like(gsr["opacity"])
amz = jnp.zeros((col.shape[0], 4), jnp.float32)
bgr = jnp.zeros(1)
KCAP = 896


def loss_table(m2):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=KCAP)
    pl_ = build_payload(p, col, amz, b, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend(pl_, b.counts, nty, ntx, False, False, True, bgr)
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


def loss_ind(m2):
    p = pre._replace(mean2d=m2)
    b = B.bin_gaussians(p, H, W, capacity=1024)
    f = stack_fields(p, col, amz, geo=False, invd=False, ones=True)
    c, _, _, _ = tile_blend_indirect(
        f, b.gather_idx, b.counts, nty, ntx, False, False, True, bgr
    )
    return (untile_image(c, nty, ntx)[:H, :W] * gt0).sum()


def timeit(fn, label, reps=60):
    try:
        t0 = time.time()
        out = jax.block_until_ready(fn(pre.mean2d))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(pre.mean2d)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:70s} {dt:8.3f} ms  (compile {tc:.1f}s)", flush=True)
    except Exception as e:  # invalid flag names raise at compile
        print(f"{label:70s} FAILED: {type(e).__name__}: {e}", flush=True)


VARIANTS = [
    ("baseline(null)", None),
    ("vf_vmem_memory_space_assignment=false",
     {"xla_vf_vmem_memory_space_assignment": "false"}),
    ("msa_enable=false", {"xla_msa_enable": "false"}),
    ("vf_max_vmem_used_by_msa=0",
     {"xla_vf_max_vmem_used_by_memory_space_assignment": "0"}),
    ("custom_call_scoped_vmem_adjustments=false",
     {"xla_tpu_enable_tpu_custom_call_scoped_vmem_adjustments": "false"}),
    ("msa_reduce_scoped_vmem_limit=true",
     {"xla_tpu_msa_reduce_scoped_vmem_limit": "true"}),
    ("scoped_vmem_limit_kib=16384",
     {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
]

for label, opts in VARIANTS:
    timeit(jax.jit(jax.grad(loss_table), compiler_options=opts),
           f"table grad K=896 [{label}]")

timeit(jax.jit(jax.grad(loss_ind)), "indirect grad K=1024 [null]")
timeit(jax.jit(jax.grad(loss_table)), "table grad K=896 [baseline re-run]")
print("done", flush=True)

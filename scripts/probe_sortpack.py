#!/usr/bin/env python
"""Is a 2-operand packed sort cheaper than the 3-operand (tile, depth,
value) sort at pair volume?  Informs ROADMAP lever 3 (sort-key packing).

Probe rules (CLAUDE.md): device arrays as jit ARGS, scan bodies carry a
data dependence so the sort cannot DCE/hoist, sync by pulling a VALUE,
interleave variants within one grant, compare medians.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
import jax.numpy as jnp
import numpy as np

N = 245760  # bench-point pair volume
STEPS = 50

rng = np.random.default_rng(0)
tile = jnp.asarray(rng.integers(0, 256, N), jnp.int32)
depth = jnp.asarray(rng.uniform(0.2, 10.0, N), jnp.float32)
val = jnp.asarray(rng.integers(0, 49152, N), jnp.int32)


@jax.jit
def sort3(tile, depth, val):
    # the PRODUCTION 3-operand sort (_bin_sort SORT_PACKED=False):
    # num_keys=3, the value operand is the deterministic tie-break key.
    # (The round-4 run of this probe used num_keys=2 — a slightly
    # CHEAPER-than-production baseline, so the measured win was
    # conservative; fixed per ADVICE r4.)
    def body(c, _):
        d = depth + c * 1e-12
        _, _, v = jax.lax.sort((tile, d, val), num_keys=3)
        return v[0].astype(jnp.float32), None

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
    return c


@jax.jit
def sort2(tile, depth, val):
    # pack: tile in the top 8 bits, 24 depth bits below (monotone for
    # positive floats: the f32 bit pattern orders correctly).  uint32
    # key, exactly as the production SORT_PACKED branch — a signed key
    # would order tiles >= 128 first (sign bit), which times the same
    # but models the wrong comparison (ADVICE r4).
    def body(c, _):
        d = depth + c * 1e-12
        dbits = jax.lax.bitcast_convert_type(d, jnp.uint32) >> 8
        key = (tile.astype(jnp.uint32) << 24) | (dbits & 0x00FFFFFF)
        _, v = jax.lax.sort_key_val(key, val)
        return v[0].astype(jnp.float32), None

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
    return c


def timeit(fn, *args):
    t0 = time.time()
    out = float(np.asarray(jax.device_get(fn(*args))))
    return (time.time() - t0) / STEPS * 1e3, out


print("device:", jax.devices()[0].device_kind, flush=True)
# warm both (compile + first grant execute)
timeit(sort3, tile, depth, val)
timeit(sort2, tile, depth, val)
r = {"sort3": [], "sort2": []}
for _ in range(5):
    ms, _ = timeit(sort3, tile, depth, val)
    r["sort3"].append(ms)
    ms, _ = timeit(sort2, tile, depth, val)
    r["sort2"].append(ms)
for k, v in r.items():
    print(f"{k}: median {np.median(v):.3f} ms  all {[f'{x:.3f}' for x in v]}",
          flush=True)

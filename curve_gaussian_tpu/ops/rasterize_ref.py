"""Reference rasterizer: slow, pure-JAX, differentiable via autodiff.

This is the semantic definition of the renderer and the correctness oracle
for the fast Pallas tile kernels.  Compositing semantics re-derived from the
reference CUDA kernel (cuda_rasterizer/forward.cu:279-417):

  For each pixel p, iterate Gaussians in increasing view-depth order.
  Gaussian g CONTRIBUTES to p iff
    * g is valid (not culled) and g is a candidate for p's TILE.  Like the
      reference CUDA, candidacy is at tile granularity: every pixel of a
      tile on g's binned list tests g, with no per-pixel bbox test
      (forward.cu:336-372 has only the power/alpha cutoffs).  The optional
      `member` argument supplies the per-(gaussian, tile) candidacy — pass
      `membership()` of the binning to reproduce the tiled kernel
      bit-for-bit (including per-tile capacity truncation); the default
      (None) is the un-truncated limit where every valid Gaussian is a
      candidate for every tile.
    * power = -0.5*(a dx^2 + c dy^2) - b dx dy <= 0
    * alpha = min(0.99, opa * exp(power)) >= 1/255
    * the transmittance test T*(1-alpha) >= 1e-4; the first failing Gaussian
      permanently terminates the pixel (done flag), excluding itself.
  Accumulate C += col * alpha * T; invD += (1/depth) * alpha * T;
  AM[k] += allmap[k] * alpha * T;  T *= (1-alpha).
  Final color adds T_final * bg (forward.cu:405).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from .projection import Preprocessed

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99
# tile geometry lives here (not binning.py) so both the binning and the
# oracle's tile-candidacy gather agree without a circular import.
# SPATIAL tiles are 32x32 px (like the reference's 16x16 CUDA blocks in
# spirit): a compact square minimizes tiles-overlapped per Gaussian (~30%
# fewer blend instances than an 8x128 strip at equal pixel count) and 32
# divides common image sizes (512, 800) exactly.  The Pallas kernels still
# compute on native (8,128) registers — they map register lane (s, l) to
# tile pixel (4s + l//32, l%32) and emit TILED outputs that render()
# untiles with one XLA reshape/transpose.
TILE_H = 32
TILE_W = 32


def depth_order(pre: Preprocessed) -> jnp.ndarray:
    """Indices of all Gaussians sorted by view depth, invalid ones last."""
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    return jnp.argsort(key)


def membership(binning, num_gaussians: int) -> jnp.ndarray:
    """[P, T] bool: Gaussian p is on tile t's (possibly truncated) list."""
    T, K = binning.gather_idx.shape
    mem = jnp.zeros((num_gaussians + 1, T), bool)
    rows = jnp.where(binning.slot_valid, binning.gather_idx, num_gaussians)
    cols = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None], (T, K))
    mem = mem.at[rows, cols].set(True, mode="drop")
    return mem[:num_gaussians]


@functools.partial(
    jax.jit, static_argnames=("height", "width", "chunk", "render_geo")
)
def rasterize_reference(
    pre: Preprocessed,
    color: jnp.ndarray,  # [P] single-channel feature (all-ones in practice)
    allmap: jnp.ndarray,  # [P, 4]
    bg: jnp.ndarray,  # scalar background for the single channel
    height: int,
    width: int,
    chunk: int = 32,
    render_geo: bool = True,
    member: jnp.ndarray | None = None,  # [P, T] tile-candidacy (see docstring)
):
    """Returns dict(render [H,W], invdepth [H,W], allmap [4,H,W], final_T [H,W])."""
    order = jax.lax.stop_gradient(depth_order(pre))
    P = pre.mean2d.shape[0]
    npix = height * width
    px = jnp.arange(width, dtype=pre.mean2d.dtype)
    py = jnp.arange(height, dtype=pre.mean2d.dtype)
    pixx = jnp.tile(px[None, :], (height, 1)).reshape(npix)
    pixy = jnp.tile(py[:, None], (1, width)).reshape(npix)

    # pack per-gaussian rows in depth order: [P, 12]
    rows = jnp.concatenate(
        [
            pre.mean2d,
            pre.conic,
            pre.opacity[:, None],
            color[:, None],
            jnp.where(
                pre.valid, 1.0 / jnp.where(pre.valid, pre.depth, 1.0), 0.0
            )[:, None],
            allmap,
        ],
        axis=-1,
    )[order]
    valid_sorted = pre.valid[order]
    rows = jnp.where(valid_sorted[:, None], rows, 0.0)
    if member is None:
        member_sorted = jnp.ones((P, 1), bool)
        tile_idx = jnp.zeros((npix,), jnp.int32)
    else:
        member_sorted = member[order]
        ntx = member.shape[1] // max(-(-height // TILE_H), 1)
        tile_idx = (
            (jnp.arange(npix, dtype=jnp.int32) // width // TILE_H) * ntx
            + (jnp.arange(npix, dtype=jnp.int32) % width) // TILE_W
        )
    pad = (-P) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, rows.shape[1]), rows.dtype)], 0)
        valid_sorted = jnp.concatenate([valid_sorted, jnp.zeros((pad,), bool)], 0)
        member_sorted = jnp.concatenate(
            [member_sorted, jnp.zeros((pad, member_sorted.shape[1]), bool)], 0
        )
    rows = rows.reshape(-1, chunk, rows.shape[1])
    valid_sorted = valid_sorted.reshape(-1, chunk)
    member_sorted = member_sorted.reshape(-1, chunk, member_sorted.shape[1])

    def blend_one(state, g_row, g_valid, g_mem):
        T, active, C, invD, AM = state
        mx, my = g_row[0], g_row[1]
        ca, cb, cc = g_row[2], g_row[3], g_row[4]
        opa = g_row[5]
        col = g_row[6]
        inv_depth = g_row[7]
        am = g_row[8:12]
        dx = mx - pixx
        dy = my - pixy
        inside = g_mem[tile_idx] & g_valid
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        # straight-through min: forward clamps at 0.99 but gradients flow as
        # if unclamped, matching the reference backward (backward.cu:490-505
        # computes dL_dG = opacity * dL_dalpha with no clamp gating).
        alpha_u = opa * jnp.exp(power)
        alpha = alpha_u + jax.lax.stop_gradient(
            jnp.minimum(ALPHA_MAX, alpha_u) - alpha_u
        )
        cand = inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
        test_T = jnp.where(cand, T * (1.0 - alpha), T)
        newly_done = cand & (test_T < T_EPS)
        contrib = cand & (~newly_done) & active
        w = jnp.where(contrib, alpha * T, 0.0)
        C = C + col * w
        invD = invD + inv_depth * w
        AM = AM + am[:, None] * w[None, :]
        T = jnp.where(contrib, test_T, T)
        active = active & ~newly_done
        return (T, active, C, invD, AM)

    @jax.checkpoint
    def chunk_step(state, xs):
        g_rows, g_valids, g_mems = xs

        def body(i, st):
            return blend_one(st, g_rows[i], g_valids[i], g_mems[i])

        state = jax.lax.fori_loop(0, chunk, body, state)
        return state, None

    init = (
        jnp.ones((npix,), rows.dtype),
        jnp.ones((npix,), bool),
        jnp.zeros((npix,), rows.dtype),
        jnp.zeros((npix,), rows.dtype),
        jnp.zeros((4, npix), rows.dtype),
    )
    (T, _, C, invD, AM), _ = jax.lax.scan(
        chunk_step, init, (rows, valid_sorted, member_sorted)
    )

    out = {
        "render": (C + T * bg).reshape(height, width),
        "invdepth": invD.reshape(height, width),
        "final_T": T.reshape(height, width),
    }
    if render_geo:
        out["allmap"] = AM.reshape(4, height, width)
    else:
        out["allmap"] = jnp.zeros((4, height, width), rows.dtype)
    return out

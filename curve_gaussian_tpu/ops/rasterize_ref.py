"""Reference rasterizer: slow, pure-JAX, differentiable via autodiff.

This is the semantic definition of the renderer and the correctness oracle
for the fast Pallas tile kernels.  Compositing semantics re-derived from the
reference CUDA kernel (cuda_rasterizer/forward.cu:279-417):

  For each pixel p, iterate Gaussians in increasing view-depth order.
  Gaussian g CONTRIBUTES to p iff
    * g is valid (not culled) and p lies inside g's tight 3-sigma AABB
      (the candidacy rule; the CUDA code uses a radius-square bbox at tile
      granularity instead — an implementation detail that only changes which
      near-zero tails get included.  We define candidacy at PIXEL granularity
      so the tiled kernel can use any tile size and still match this oracle
      bit-for-bit.)
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


def depth_order(pre: Preprocessed) -> jnp.ndarray:
    """Indices of all Gaussians sorted by view depth, invalid ones last."""
    key = jnp.where(pre.valid, pre.depth, jnp.inf)
    return jnp.argsort(key)


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
            pre.extent,
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
    pad = (-P) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, rows.shape[1]), rows.dtype)], 0)
        valid_sorted = jnp.concatenate([valid_sorted, jnp.zeros((pad,), bool)], 0)
    rows = rows.reshape(-1, chunk, rows.shape[1])
    valid_sorted = valid_sorted.reshape(-1, chunk)

    def blend_one(state, g_row, g_valid):
        T, active, C, invD, AM = state
        mx, my = g_row[0], g_row[1]
        ca, cb, cc = g_row[2], g_row[3], g_row[4]
        opa = g_row[5]
        ex, ey = g_row[6], g_row[7]
        col = g_row[8]
        inv_depth = g_row[9]
        am = g_row[10:14]
        dx = mx - pixx
        dy = my - pixy
        inside = (jnp.abs(dx) <= ex) & (jnp.abs(dy) <= ey) & g_valid
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
        g_rows, g_valids = xs

        def body(i, st):
            return blend_one(st, g_rows[i], g_valids[i])

        state = jax.lax.fori_loop(0, chunk, body, state)
        return state, None

    init = (
        jnp.ones((npix,), rows.dtype),
        jnp.ones((npix,), bool),
        jnp.zeros((npix,), rows.dtype),
        jnp.zeros((npix,), rows.dtype),
        jnp.zeros((4, npix), rows.dtype),
    )
    (T, _, C, invD, AM), _ = jax.lax.scan(chunk_step, init, (rows, valid_sorted))

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

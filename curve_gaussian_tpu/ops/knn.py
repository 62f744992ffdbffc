"""k-nearest-neighbor mean distances (TPU-native replacement for simple-knn).

The reference uses a Morton-sorted CUDA kNN (submodules/simple-knn) solely to
compute `distCUDA2(points)` = mean SQUARED distance to each point's 3 nearest
neighbors, at model init (scene/gaussian_curve_model.py:149-151).  On TPU the
exact chunked pairwise computation is a batched matmul (MXU work) and is
plenty fast for the N <= O(100k) seed clouds involved; no spatial structure
needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 4096) -> jnp.ndarray:
    """[N,3] -> [N] mean squared distance to the k nearest neighbors."""
    n = points.shape[0]
    if n <= 1:
        return jnp.full((n,), 1e-4, points.dtype)
    k = min(k, n - 1)  # fewer points than neighbors: use what exists
    sq = jnp.sum(points**2, axis=-1)
    pad = (-n) % chunk
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))

    def one_chunk(c):
        q = jax.lax.dynamic_slice_in_dim(pts_p, c * chunk, chunk)
        qsq = jax.lax.dynamic_slice_in_dim(sq_p, c * chunk, chunk)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ points.T)
        # self-distance ~0: mask it (and padded queries' garbage is cropped)
        row = c * chunk + jnp.arange(chunk)
        d2 = jnp.where(row[:, None] == jnp.arange(n)[None, :], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg_top, 0.0).mean(axis=-1)

    out = jax.lax.map(one_chunk, jnp.arange((n + pad) // chunk))
    return out.reshape(-1)[:n]

"""Quaternion / rotation utilities (pure jnp, fully batched & differentiable).

Conventions: quaternions are (w, x, y, z), real part first.
Parity targets (semantics, re-derived):
  reference utils/general_utils.py:33-86 (rot_to_quat_batch, pytorch3d port)
  reference utils/graphics_utils.py:106-154 (quaternion multiply / rotate)
  reference cuda_rasterizer/forward.cu:118-152 (quat -> rotation matrix)
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] rotation matrix.

    Matches the (unnormalized-tolerant) expansion used by the reference
    rasterizer (forward.cu:134-138): callers are expected to pass unit
    quaternions.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    # double-where keeps the gradient finite at x <= 0 (sqrt'(0) = inf would
    # otherwise produce 0*inf = NaN for the three non-selected candidates)
    pos = x > 0
    safe = jnp.where(pos, x, 1.0)
    return jnp.where(pos, jnp.sqrt(safe), 0.0)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Force a non-negative real part (q and -q encode the same rotation)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z) unit quaternion.

    Numerically robust branch-free version of the pytorch3d algorithm the
    reference uses (general_utils.py:33-86): build all four candidate
    quaternions and select the best-conditioned one.
    """
    batch_shape = rot.shape[:-2]
    m = rot.reshape(batch_shape + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return standardize_quaternion(out)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, [..., 4] x [..., 4] -> [..., 4]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate_by_quat(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate points p [..., 3] by unit quaternions q [..., 4]."""
    pq = jnp.concatenate([jnp.zeros_like(p[..., :1]), p], axis=-1)
    q_conj = jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)
    return quat_multiply(quat_multiply(q, pq), q_conj)[..., 1:]

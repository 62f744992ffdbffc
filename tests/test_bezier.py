"""Golden tests for the Bézier/line geometry core.

Oracles: closed-form polynomial identities and numpy reimplementations of the
formulas in reference scene/gaussian_curve_model.py:70-89, 388-421.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.ops import bezier
from curve_gaussian_tpu.ops.quaternion import (
    quat_to_rotmat,
    rotmat_to_quat,
    rotate_by_quat,
)


def np_bezier(cp, t):
    t = np.asarray(t)[:, None]
    u = 1 - t
    return (
        u**3 * cp[0] + 3 * u**2 * t * cp[1] + 3 * u * t**2 * cp[2] + t**3 * cp[3]
    )


def test_bezier_point_matches_numpy(rng):
    cp = rng.normal(size=(5, 4, 3)).astype(np.float32)
    t = np.linspace(0, 1, 7).astype(np.float32)
    out = bezier.bezier_point(jnp.asarray(cp), jnp.asarray(t))
    for i in range(5):
        np.testing.assert_allclose(np.asarray(out[i]), np_bezier(cp[i], t), rtol=1e-5)


def test_bezier_tangent_is_derivative(rng):
    cp = jnp.asarray(rng.normal(size=(3, 4, 3)), jnp.float32)
    t = jnp.asarray([0.2, 0.5, 0.9], jnp.float32)
    eps = 1e-3
    num = (bezier.bezier_point(cp, t + eps) - bezier.bezier_point(cp, t - eps)) / (
        2 * eps
    )
    ana = bezier.bezier_tangent(cp, t)
    np.testing.assert_allclose(np.asarray(num), np.asarray(ana), atol=1e-2)


def test_line_eval_uses_endpoints(rng):
    cp = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    t = jnp.asarray([0.0, 0.25, 1.0], jnp.float32)
    is_bez = jnp.zeros((2,), bool)
    out = bezier.curve_point(cp, t, is_bez)
    expect = (1 - t[None, :, None]) * cp[:, None, 0] + t[None, :, None] * cp[:, None, 3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-6)


def test_de_casteljau_split_reproduces_curve(rng):
    """Left/right pieces re-evaluated must lie on the original curve."""
    cp = jnp.asarray(rng.normal(size=(4, 4, 3)), jnp.float32)
    tsplit = jnp.asarray([0.3, 0.5, 0.62, 0.9], jnp.float32)
    is_bez = jnp.ones((4,), bool)
    left, right = bezier.de_casteljau_split(cp, tsplit, is_bez)
    s = jnp.asarray([0.0, 0.37, 0.71, 1.0], jnp.float32)
    orig_left = bezier.bezier_point(cp, jnp.zeros(1))  # placeholder for shape
    for i in range(4):
        ts = tsplit[i]
        pts_left = bezier.bezier_point(left[i : i + 1], s)[0]
        expect = np_bezier(np.asarray(cp[i]), np.asarray(s * ts))
        np.testing.assert_allclose(np.asarray(pts_left), expect, atol=1e-5)
        pts_right = bezier.bezier_point(right[i : i + 1], s)[0]
        expect = np_bezier(np.asarray(cp[i]), np.asarray(ts + s * (1 - ts)))
        np.testing.assert_allclose(np.asarray(pts_right), expect, atol=1e-5)


def test_trim_keeps_segment(rng):
    cp = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    is_bez = jnp.ones((2,), bool)
    a, b = jnp.asarray([0.2, 0.1]), jnp.asarray([0.5, 0.8])
    trimmed = bezier.de_casteljau_trim(cp, a, b, is_bez)
    # start point of trimmed curve == original at t=a
    start = bezier.bezier_point(trimmed, jnp.zeros(1))[:, 0]
    expect = jnp.stack(
        [bezier.bezier_point(cp[i : i + 1], a[i : i + 1])[0, 0] for i in range(2)]
    )
    np.testing.assert_allclose(np.asarray(start), np.asarray(expect), atol=1e-5)


def test_curve_gaussians_shapes_and_spacing(rng):
    n, m = 6, 12
    cp = jnp.asarray(rng.normal(size=(n, 4, 3)), jnp.float32)
    width = jnp.full((n,), 5e-3, jnp.float32)
    is_bez = jnp.ones((n,), bool)
    g = bezier.curve_gaussians(cp, width, is_bez, m)
    assert g["xyz"].shape == (n, m, 3)
    assert g["quat"].shape == (n, m, 4)
    assert g["scale"].shape == (n, m, 3)
    # s1 = s2 = width
    np.testing.assert_allclose(np.asarray(g["scale"][..., 1]), 5e-3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["scale"][..., 2]), 5e-3, rtol=1e-6)
    # s0 approximates half-step arclength spacing
    t = bezier.sample_t_midpoints(m)
    pts = bezier.bezier_point(cp, t)
    back = bezier.bezier_point(cp, t - 0.5 / m)
    np.testing.assert_allclose(
        np.asarray(g["scale"][..., 0]),
        np.linalg.norm(np.asarray(pts - back), axis=-1),
        rtol=1e-5,
    )
    # quaternion first axis == normalized tangent
    R = quat_to_rotmat(g["quat"])
    v0 = R[..., :, 0]
    tan = g["tangent"] / jnp.linalg.norm(g["tangent"], axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(tan), atol=1e-4)


def test_rotmat_quat_roundtrip(rng):
    # random rotations via QR
    a = rng.normal(size=(50, 3, 3))
    q_, _ = np.linalg.qr(a)
    det = np.linalg.det(q_)
    q_[det < 0, :, 0] *= -1  # make proper rotations
    R = jnp.asarray(q_, jnp.float32)
    quat = rotmat_to_quat(R)
    R2 = quat_to_rotmat(quat)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # norm 1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(quat), axis=-1), 1.0, atol=1e-5
    )


def test_rotate_by_quat_matches_matrix(rng):
    a = rng.normal(size=(10, 3, 3))
    q_, _ = np.linalg.qr(a)
    det = np.linalg.det(q_)
    q_[det < 0, :, 0] *= -1
    R = jnp.asarray(q_, jnp.float32)
    quat = rotmat_to_quat(R)
    p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rotate_by_quat(quat, p)),
        np.asarray(jnp.einsum("nij,nj->ni", R, p)),
        atol=1e-5,
    )


def test_gradients_flow_to_control_points(rng):
    """d(sum of gaussian centers)/d(cp) must be nonzero & finite."""
    cp = jnp.asarray(rng.normal(size=(3, 4, 3)), jnp.float32)
    width = jnp.full((3,), 5e-3, jnp.float32)
    is_bez = jnp.ones((3,), bool)

    def f(cp):
        g = bezier.curve_gaussians(cp, width, is_bez, 8)
        return (g["xyz"].sum() + g["scale"].sum()) * 1.0

    grad = jax.grad(f)(cp)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0


def test_initialize_bezier_curves(rng):
    pts = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    bound = jnp.full((5,), 0.1, jnp.float32)
    cp = bezier.initialize_bezier_curves(pts, bound)
    assert cp.shape == (5, 4, 3)
    np.testing.assert_allclose(
        np.asarray(cp[:, 0]), np.asarray(pts) - [0, 0.1, 0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cp[:, 3]), np.asarray(pts) + [0, 0.1, 0], atol=1e-6
    )


def test_minimal_rotation_frame_equivalent_covariance(rng):
    """curve_gaussians' minimal-rotation quat must give the SAME Gaussian
    covariance as the cross-product tangent frame (s1 == s2 makes every
    orthonormal completion of the tangent axis equivalent), and its first
    axis must be the normalized tangent."""
    import jax.numpy as jnp

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.ops import bezier
    from curve_gaussian_tpu.ops.projection import build_cov3d
    from curve_gaussian_tpu.ops.quaternion import quat_to_rotmat, rotmat_to_quat

    cp, is_bez = synthetic.random_curves(rng, 20, 5)
    width = jnp.asarray(rng.uniform(0.003, 0.02, size=cp.shape[0]), jnp.float32)
    g = bezier.curve_gaussians(jnp.asarray(cp), width, jnp.asarray(is_bez), 8)
    scale = g["scale"].reshape(-1, 3)
    quat_new = g["quat"].reshape(-1, 4)
    tangent = g["tangent"].reshape(-1, 3)

    # first rotation axis == normalized tangent
    R_new = quat_to_rotmat(quat_new)
    np.testing.assert_allclose(
        np.asarray(R_new[:, :, 0]),
        np.asarray(bezier.safe_normalize(tangent)),
        atol=1e-5,
    )
    # covariance identical to the cross-product-frame construction
    quat_tf = rotmat_to_quat(bezier.tangent_frame(tangent))
    cov_new = build_cov3d(scale, quat_new)
    cov_tf = build_cov3d(scale, quat_tf)
    np.testing.assert_allclose(
        np.asarray(cov_new), np.asarray(cov_tf), atol=1e-7
    )


def test_ewa_direct_matches_einsum_form(rng):
    """ewa_cov2d_direct (fused component hot path) == ewa_cov2d(build_cov3d)
    (the explicit [P,3,3] formulation), values and gradients."""
    import jax
    import jax.numpy as jnp

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.ops.projection import (
        build_cov3d,
        ewa_cov2d,
        ewa_cov2d_direct,
    )

    cam = synthetic.ring_cameras(1, 64, 96)[0]
    P = 257
    xyz = jnp.asarray(rng.normal(0.5, 0.3, (P, 3)), jnp.float32)
    scale = jnp.asarray(rng.uniform(1e-3, 0.05, (P, 3)), jnp.float32)
    q = rng.normal(size=(P, 4))
    quat = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True), jnp.float32)

    def f_direct(xyz, scale, quat):
        return jnp.sum(ewa_cov2d_direct(xyz, scale, quat, cam) ** 2)

    def f_einsum(xyz, scale, quat):
        return jnp.sum(ewa_cov2d(xyz, build_cov3d(scale, quat), cam) ** 2)

    a = ewa_cov2d_direct(xyz, scale, quat, cam)
    b = ewa_cov2d(xyz, build_cov3d(scale, quat), cam)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
    ga = jax.grad(f_direct, argnums=(0, 1, 2))(xyz, scale, quat)
    gb = jax.grad(f_einsum, argnums=(0, 1, 2))(xyz, scale, quat)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=3e-4, atol=1e-6
        )

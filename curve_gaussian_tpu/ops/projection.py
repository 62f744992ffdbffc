"""Per-Gaussian preprocessing: projection + EWA 2D covariance (pure jnp).

Vectorized, differentiable equivalent of the reference preprocess kernel
(cuda_rasterizer/forward.cu:78-274).  On TPU this is plain data-parallel VPU
work that XLA fuses; the hand-derived CUDA backward
(backward.cu:146-448) is replaced by autodiff through these formulas.

All constants follow the reference:
  * near-plane cull at z_view <= 0.2      (auxiliary.h:166)
  * EWA x/y clamp at 1.3 * tanfov          (forward.cu:86-91)
  * +0.3 px low-pass dilation (h_var)      (forward.cu:219-222)
  * radius = ceil(3 * sqrt(max eigenvalue))(forward.cu:241-244)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .camera import Camera
from .quaternion import quat_to_rotmat

NEAR_CULL_Z = 0.2
H_VAR = 0.3


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray  # [P, 2] pixel coords
    conic: jnp.ndarray  # [P, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray  # [P] view-space z
    opacity: jnp.ndarray  # [P] effective opacity (AA compensation applied)
    radius: jnp.ndarray  # [P] int32 screen radius (0 => culled)
    extent: jnp.ndarray  # [P, 2] tight half-extent of the 3-sigma ellipse (px)
    valid: jnp.ndarray  # [P] bool


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray, modifier: float = 1.0) -> jnp.ndarray:
    """[P,3] scales, [P,4] unit quats -> [P,3,3] world covariance R S^2 R^T."""
    R = quat_to_rotmat(quat)
    s2 = (modifier * scale) ** 2
    return jnp.einsum("pij,pj,pkj->pik", R, s2, R)


def _jacobian_rows(mean3d: jnp.ndarray, cam: Camera):
    """The two image rows of T = J @ W as per-component [P] scalars.

    Returns ((t00, t01, t02), (t10, t11, t12)) with the reference's
    1.3*tanfov frustum clamp applied inside J (forward.cu:86-113).
    """
    Wv = cam.world_to_cam[:3, :3]
    tview = mean3d @ Wv.T + cam.world_to_cam[:3, 3]
    tz = tview[:, 2]
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(tview[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(tview[:, 1] / tz, -limy, limy) * tz

    fx, fy = cam.focal_x, cam.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (only the two image rows matter)
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    T0 = tuple(j00 * Wv[0, i] + j02 * Wv[2, i] for i in range(3))
    T1 = tuple(j11 * Wv[1, i] + j12 * Wv[2, i] for i in range(3))
    return T0, T1


def ewa_cov2d(
    mean3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: Camera,
) -> jnp.ndarray:
    """Project world covariance to 2D pixel covariance (EWA splatting).

    Returns [P,3] (cov_xx, cov_xy, cov_yy) WITHOUT the low-pass dilation.
    General form for an explicit [P,3,3] cov3d (tests, cov3d_precomp
    compat); the hot path uses ewa_cov2d_direct, which never materializes
    the 3x3s.
    """
    (t00, t01, t02), (t10, t11, t12) = _jacobian_rows(mean3d, cam)
    T0 = jnp.stack([t00, t01, t02], axis=-1)
    T1 = jnp.stack([t10, t11, t12], axis=-1)
    # cov2d = T Sigma T^T
    S0 = jnp.einsum("pi,pij->pj", T0, cov3d)
    S1 = jnp.einsum("pi,pij->pj", T1, cov3d)
    cxx = jnp.einsum("pj,pj->p", S0, T0)
    cxy = jnp.einsum("pj,pj->p", S0, T1)
    cyy = jnp.einsum("pj,pj->p", S1, T1)
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def ewa_cov2d_direct(
    mean3d: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    cam: Camera,
    modifier: float = 1.0,
) -> jnp.ndarray:
    """EWA 2D covariance straight from (scale, quat) as ONE elementwise
    fusion — no [P,3,3] intermediates.

    Identical math to ewa_cov2d(build_cov3d(...)): with M = R diag(s) the
    world covariance is M M^T, so cov2d = (T M)(T M)^T needs only the two
    rows u = T0 M, v = T1 M.  Expressed per component on [P] vectors, XLA
    fuses the whole chain into one VPU pass; the einsum formulation instead
    materialized [P,3,3] arrays whose layout copies, bf16 MXU passes and
    autodiff transposes cost ~2.9 ms/step at the bench point (trace
    r3/trace_1v) for what is ~60 flops/Gaussian of arithmetic.
    """
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = modifier * scale[:, 0]
    s1 = modifier * scale[:, 1]
    s2 = modifier * scale[:, 2]

    (t00, t01, t02), (t10, t11, t12) = _jacobian_rows(mean3d, cam)
    # u_k = (T0 . R[:, k]) s_k ; v_k = (T1 . R[:, k]) s_k
    u0 = (t00 * r00 + t01 * r10 + t02 * r20) * s0
    u1 = (t00 * r01 + t01 * r11 + t02 * r21) * s1
    u2 = (t00 * r02 + t01 * r12 + t02 * r22) * s2
    v0 = (t10 * r00 + t11 * r10 + t12 * r20) * s0
    v1 = (t10 * r01 + t11 * r11 + t12 * r21) * s1
    v2 = (t10 * r02 + t11 * r12 + t12 * r22) * s2
    cxx = u0 * u0 + u1 * u1 + u2 * u2
    cxy = u0 * v0 + u1 * v1 + u2 * v2
    cyy = v0 * v0 + v1 * v1 + v2 * v2
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """auxiliary.h ndc2Pix: ((v + 1) * S - 1) / 2."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    mean3d: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    cam: Camera,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    alive: jnp.ndarray | None = None,
) -> Preprocessed:
    """Full per-Gaussian preprocess.

    mean3d [P,3], scale [P,3], quat [P,4], opacity [P]; `alive` optionally
    masks out padding rows (capacity-based topology).
    """
    P = mean3d.shape[0]
    # view/proj transforms
    hom = mean3d @ cam.full_proj[:3, :3].T + cam.full_proj[:3, 3]
    w = mean3d @ cam.full_proj[3, :3] + cam.full_proj[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc_xy = hom[:, :2] * inv_w[:, None]
    z_view = mean3d @ cam.world_to_cam[2, :3] + cam.world_to_cam[2, 3]

    cov = ewa_cov2d_direct(mean3d, scale, quat, cam, scale_modifier)
    det_raw = cov[:, 0] * cov[:, 2] - cov[:, 1] ** 2
    cxx = cov[:, 0] + H_VAR
    cyy = cov[:, 2] + H_VAR
    cxy = cov[:, 1]
    det = cxx * cyy - cxy * cxy
    if antialiasing:
        compensation = jnp.sqrt(jnp.maximum(2.5e-5, det_raw / det))
    else:
        compensation = jnp.ones_like(det)

    det_inv = 1.0 / det
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    mean2d = jnp.stack(
        [ndc2pix(ndc_xy[:, 0], cam.width), ndc2pix(ndc_xy[:, 1], cam.height)], axis=-1
    )
    opa_eff = opacity * compensation
    # axis-aligned half extents of the EXACT alpha-support ellipse: the
    # kernels gate per pixel on alpha >= 1/255 (rasterize_ref.ALPHA_EPS),
    # whose region {d' conic d <= 2 ln(255 opa)} has per-axis AABB reach
    # sqrt(2 ln(255 opa)) * sigma_axis (up to 3.33 sigma at opa=1).  A
    # fixed-3-sigma AABB truncated pixels in the [3, 3.33] sigma ring that
    # pass the alpha gate (caught by the float64 torch oracle as ~1%
    # gradient deltas on tile-straddling splats).  The reference clips to
    # an isotropic ceil(3 sqrt(lam_max)) SQUARE (forward.cu:241-244), which
    # both over-covers (short axis) and under-covers (major-axis ring past
    # 3 sigma) the support; covering the support exactly is the
    # strictly-more-correct superset and keeps binning candidacy minimal.
    reach = jnp.sqrt(2.0 * jnp.maximum(jnp.log(
        jnp.maximum(opa_eff, 1e-12) * 255.0
    ), 0.0))
    ext = reach[:, None] * jnp.sqrt(
        jnp.maximum(jnp.stack([cxx, cyy], axis=-1), 0.0)
    )

    valid = (z_view > NEAR_CULL_Z) & (det > 0.0) & (radius_f > 0.0)
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Preprocessed(
        mean2d=mean2d,
        conic=conic,
        depth=z_view,
        opacity=opa_eff,
        radius=radius,
        extent=ext,
        valid=valid,
    )

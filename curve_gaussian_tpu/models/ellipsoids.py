"""Ellipsoid-mesh visualization of the Gaussian set.

Host-side, numpy-only equivalent of the reference's draw_ellipsoids
(scene/gaussian_curve_model.py:633-709, which builds one open3d sphere per
Gaussian in a Python loop): a unit UV sphere is instanced for ALL Gaussians
in one vectorized transform, colored per curve (lines black, mask-pruned
Gaussians white, same conventions incl. the radius=1.2 sphere), and written
as a single binary mesh PLY — no open3d dependency.
"""
from __future__ import annotations

import colorsys

import numpy as np

from ..data.ply import write_ply_mesh
from ..ops.quaternion import quat_to_rotmat


def unit_sphere(resolution: int = 10):
    """UV sphere matching o3d create_sphere(resolution): `resolution`
    latitude bands, 2*resolution longitude steps."""
    res = resolution
    lats = np.pi * (np.arange(1, res) / res)  # exclude poles
    lons = 2 * np.pi * (np.arange(2 * res) / (2 * res))
    lat, lon = np.meshgrid(lats, lons, indexing="ij")
    ring = np.stack(
        [
            np.sin(lat) * np.cos(lon),
            np.sin(lat) * np.sin(lon),
            np.cos(lat),
        ],
        axis=-1,
    ).reshape(-1, 3)
    verts = np.concatenate(
        [np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]), ring], axis=0
    )
    L = 2 * res
    faces = []
    for j in range(L):  # pole caps
        faces.append([0, 2 + j, 2 + (j + 1) % L])
        base = 2 + (res - 2) * L
        faces.append([1, base + (j + 1) % L, base + j])
    for i in range(res - 2):  # quad bands
        for j in range(L):
            a = 2 + i * L + j
            b = 2 + i * L + (j + 1) % L
            c = a + L
            d = b + L
            faces.append([a, b, d])
            faces.append([a, d, c])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def fancy_colors(n: int, seed: int = 0) -> np.ndarray:
    """Distinct per-curve colors (the reference's get_fancy_color palette
    role, utils/vis_utils.py:15-30), randomly permuted as the reference
    does."""
    hues = (np.arange(n) * 0.61803398875) % 1.0
    cols = np.array(
        [colorsys.hsv_to_rgb(h, 0.75, 0.95) for h in hues], np.float32
    )
    return cols[np.random.default_rng(seed).permutation(n)]


def save_ellipsoid_mesh(
    path: str,
    xyz: np.ndarray,  # [P, 3]
    quat: np.ndarray,  # [P, 4] (w,x,y,z)
    scale: np.ndarray,  # [P, 3]
    is_bezier: np.ndarray,  # [C]
    mask_sigmoid: np.ndarray,  # [C, M]
    radius: float = 1.2,
    resolution: int = 10,
) -> None:
    """One combined ellipsoid mesh for all Gaussians.

    Color semantics follow the reference: per-curve palette, straight-line
    curves black, mask-pruned Gaussians (sigmoid < 0.01) white."""
    import jax.numpy as jnp

    P = xyz.shape[0]
    C, M = mask_sigmoid.shape
    sv, sf = unit_sphere(resolution)
    R = np.asarray(quat_to_rotmat(jnp.asarray(quat)))  # [P, 3, 3]
    # v' = R @ (scale * radius * v) + xyz, batched over P x V
    scaled = sv[None, :, :] * (scale[:, None, :] * radius)  # [P, V, 3]
    verts = np.einsum("pij,pvj->pvi", R, scaled) + xyz[:, None, :]

    colors = fancy_colors(C)  # [C, 3]
    per_g = np.repeat(colors, M, axis=0)[:P]  # [P, 3]
    line_rows = np.repeat(~np.asarray(is_bezier, bool), M)[:P]
    per_g[line_rows] = 0.0
    pruned = (np.asarray(mask_sigmoid).reshape(-1) < 0.01)[:P]
    per_g[pruned] = 1.0
    vcols = np.repeat(per_g, sv.shape[0], axis=0)

    V = sv.shape[0]
    all_faces = (sf[None, :, :] + (np.arange(P) * V)[:, None, None]).reshape(-1, 3)
    write_ply_mesh(path, verts.reshape(-1, 3), all_faces, vcols)

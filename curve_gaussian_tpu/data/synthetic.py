"""Synthetic curve scenes: self-contained ground truth for tests & benches.

No datasets ship with this environment, so we synthesize ABC-like scenes:
random smooth Bézier curves + line segments inside the unit cube (the ABC
convention — reference eval normalizes GT to the unit cube,
eval_utils.py:251-366), render their edge maps with OUR renderer from a ring
of cameras, and use those as ground-truth edge detections.  Training then
recovers the curves from scratch exactly as the reference trains on
DexiNed/PidiNet maps, and eval can measure Chamfer/F1 against the true
generating curves — a full closed loop without external data.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops import bezier
from ..ops.camera import Camera, look_at_camera
from ..ops.render import render


@dataclasses.dataclass
class SyntheticScene:
    curves: np.ndarray  # [N, 4, 3] GT control points (unit cube)
    is_bezier: np.ndarray  # [N] bool
    cameras: List[Camera]
    edge_maps: List[np.ndarray]  # [H, W] float in [0,1]


def random_curves(rng: np.random.Generator, n_curves: int, n_lines: int = 0):
    """Smooth random cubic Béziers + straight segments in [0,1]^3."""
    n = n_curves + n_lines
    p0 = rng.uniform(0.15, 0.85, size=(n, 3))
    # random direction and moderate length
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    length = rng.uniform(0.2, 0.45, size=(n, 1))
    p3 = np.clip(p0 + d * length, 0.02, 0.98)
    # interior control points near the chord with lateral bend
    bend1 = rng.normal(0, 0.06, size=(n, 3))
    bend2 = rng.normal(0, 0.06, size=(n, 3))
    p1 = p0 + (p3 - p0) / 3 + bend1
    p2 = p0 + 2 * (p3 - p0) / 3 + bend2
    cp = np.stack([p0, p1, p2, p3], axis=1).astype(np.float32)
    is_bez = np.ones(n, bool)
    if n_lines:
        is_bez[n_curves:] = False
        cp[n_curves:, 1] = cp[n_curves:, 0]
        cp[n_curves:, 2] = cp[n_curves:, 3]
    return cp, is_bez


def ring_cameras(
    n_views: int,
    height: int,
    width: int,
    radius: float = 2.2,
    center=(0.5, 0.5, 0.5),
    fovx_deg: float = 45.0,
    elevations=(-0.35, 0.0, 0.45),
) -> List[Camera]:
    cams = []
    center = np.asarray(center, np.float64)
    for i in range(n_views):
        theta = 2 * math.pi * i / n_views
        elev = elevations[i % len(elevations)]
        eye = center + radius * np.asarray(
            [
                math.cos(theta) * math.cos(elev),
                math.sin(elev),
                math.sin(theta) * math.cos(elev),
            ]
        )
        cams.append(
            look_at_camera(
                eye=eye,
                target=center,
                fovx=math.radians(fovx_deg),
                height=height,
                width=width,
            )
        )
    return cams


def make_scene(
    seed: int = 0,
    n_curves: int = 6,
    n_lines: int = 2,
    n_views: int = 12,
    height: int = 200,
    width: int = 200,
    gt_width: float = 0.004,
    gt_opacity: float = 0.95,
    samples_per_curve: int = 48,
    backend: str = "pallas",
    capacity: int = 512,
    noise: float = 0.0,
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    cp, is_bez = random_curves(rng, n_curves, n_lines)
    cams = ring_cameras(n_views, height, width)

    cpj = jnp.asarray(cp)
    g = bezier.curve_gaussians(
        cpj, jnp.full((cp.shape[0],), gt_width), jnp.asarray(is_bez),
        samples_per_curve,
    )
    xyz = g["xyz"].reshape(-1, 3)
    scale = g["scale"].reshape(-1, 3)
    quat = g["quat"].reshape(-1, 4)
    opa = jnp.full((xyz.shape[0],), gt_opacity, jnp.float32)

    edge_maps = []
    for cam in cams:
        out = render(
            xyz, scale, quat, opa, cam, bg=0.0, capacity=capacity,
            backend=backend,
        )
        img = np.asarray(out["render"])
        if noise > 0:
            # detector-like corruption: additive speckle + response jitter
            img = img * rng.uniform(1 - noise, 1 + noise, img.shape)
            img = img + noise * 0.3 * (rng.uniform(size=img.shape) < 0.02)
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
        edge_maps.append(img)
    return SyntheticScene(
        curves=cp, is_bezier=is_bez, cameras=cams, edge_maps=edge_maps
    )


def grid_seed_points(n_per_axis: int = 15) -> np.ndarray:
    """The reference's init cloud: n^3 grid over [-0.05, 1.05]^3
    (dataset_readers.py:352-359)."""
    x = np.linspace(-0.05, 1.05, n_per_axis)
    xx, yy, zz = np.meshgrid(x, x, x)
    return np.vstack([xx.ravel(), yy.ravel(), zz.ravel()]).T.astype(np.float32)

"""ctypes bindings for the native host runtime (native/curve_native.cpp).

Builds the shared library on first use (cached); every entry point has a
numpy/scipy fallback so the framework runs without a compiler too.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_SRC_DIR, "libcurve_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _SRC_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_SRC_DIR, "curve_native.cpp")
    if not os.path.exists(_SO) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.cn_nn1.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p, i32p]
    lib.cn_knn_mean_sq.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p]
    lib.cn_connected_components.argtypes = [u8p, ctypes.c_int, i32p]
    lib.cn_connected_components.restype = ctypes.c_int32
    lib.cn_proximity_components.argtypes = [f32p, ctypes.c_int, ctypes.c_float, i32p]
    lib.cn_proximity_components.restype = ctypes.c_int32
    lib.cn_voxel_downsample.argtypes = [
        f32p,
        ctypes.c_int,
        ctypes.c_int,
        f32p,
        f32p,
        f32p,
    ]
    lib.cn_voxel_downsample.restype = ctypes.c_int32
    _lib = lib
    return _lib


def nn1(base: np.ndarray, query: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest neighbor in `base` for each row of `query` -> (dists, idx)."""
    base = np.ascontiguousarray(base, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    lib = get_lib()
    if lib is not None:
        d = np.empty(len(query), np.float32)
        i = np.empty(len(query), np.int32)
        lib.cn_nn1(base, len(base), query, len(query), d, i)
        return d.astype(np.float64), i.astype(np.int64)
    from scipy.spatial import cKDTree

    d, i = cKDTree(base).query(query, k=1)
    return d, i


def knn_mean_sq(points: np.ndarray, k: int = 3) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    lib = get_lib()
    if lib is not None and len(points) <= 200_000:
        out = np.empty(len(points), np.float32)
        lib.cn_knn_mean_sq(points, len(points), k, out)
        return out
    from scipy.spatial import cKDTree

    kk = min(k, max(len(points) - 1, 1))
    d, _ = cKDTree(points).query(points, k=kk + 1)
    return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def connected_components(adj: np.ndarray) -> Tuple[int, np.ndarray]:
    adj = np.ascontiguousarray(adj.astype(np.uint8))
    lib = get_lib()
    if lib is not None:
        labels = np.empty(len(adj), np.int32)
        n = lib.cn_connected_components(adj, len(adj), labels)
        return int(n), labels
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components as scc

    n, labels = scc(csr_matrix(adj))
    return int(n), labels


def proximity_components(points: np.ndarray, threshold: float):
    points = np.ascontiguousarray(points, np.float32)
    lib = get_lib()
    if lib is not None:
        labels = np.empty(len(points), np.int32)
        n = lib.cn_proximity_components(points, len(points), threshold, labels)
        return int(n), labels
    d = np.linalg.norm(points[:, None] - points[None], axis=-1)
    return connected_components(d <= threshold)


def voxel_downsample_average(
    points: np.ndarray, voxels_per_axis: int, min_bound, max_bound
) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    lib = get_lib()
    if lib is not None and len(points):
        out = np.empty_like(points)
        mn = np.asarray(min_bound, np.float32)
        mx = np.asarray(max_bound, np.float32)
        n = lib.cn_voxel_downsample(
            points, len(points), voxels_per_axis, mn, mx, out
        )
        return out[:n].copy()
    from .eval.metrics import downsample_voxel_average

    return downsample_voxel_average(points, voxels_per_axis, min_bound, max_bound)

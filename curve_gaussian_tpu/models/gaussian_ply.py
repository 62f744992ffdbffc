"""3DGS-format Gaussian PLY export/import (viewer interop).

Writes the standard 3D-Gaussian-Splatting vertex layout the reference emits
(scene/gaussian_model.py:383-458): x,y,z, nx,ny,nz, f_dc_*, opacity
(inverse-sigmoid), scale_* (log), rot_* — so any 3DGS viewer can display the
derived curve Gaussians.  Import reconstructs raw per-Gaussian attributes
for render-only use (curves are not recoverable from a Gaussian cloud; the
complete model state lives in the npz checkpoints instead).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def save_gaussian_ply(
    path: str,
    xyz: np.ndarray,  # [P,3]
    opacity: np.ndarray,  # [P] in (0,1)
    scale: np.ndarray,  # [P,3] linear
    quat: np.ndarray,  # [P,4] (w,x,y,z)
    features_dc: np.ndarray | None = None,  # [P, C]
) -> None:
    P = len(xyz)
    if features_dc is None:
        features_dc = np.zeros((P, 1), np.float32)
    C = features_dc.shape[1]
    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(C)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {P}\n"
        + "".join(f"property float {n}\n" for n in names)
        + "end_header\n"
    )
    eps = 1e-7
    opa_raw = np.log(np.clip(opacity, eps, 1 - eps) / (1 - np.clip(opacity, eps, 1 - eps)))
    cols = np.concatenate(
        [
            xyz,
            np.zeros_like(xyz),
            features_dc,
            opa_raw[:, None],
            np.log(np.maximum(scale, 1e-9)),
            quat,
        ],
        axis=1,
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.ascontiguousarray(cols).tobytes())


def load_gaussian_ply(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", "replace").splitlines()
    names = [l.split()[2] for l in header if l.startswith("property")]
    n = int(next(l.split()[2] for l in header if l.startswith("element vertex")))
    arr = np.frombuffer(
        data[header_end : header_end + n * len(names) * 4], "<f4"
    ).reshape(n, len(names))
    col = {name: arr[:, i] for i, name in enumerate(names)}
    dc = [k for k in names if k.startswith("f_dc_")]
    return {
        "xyz": np.stack([col["x"], col["y"], col["z"]], 1),
        "opacity": 1.0 / (1.0 + np.exp(-col["opacity"])),
        "scale": np.exp(np.stack([col[f"scale_{i}"] for i in range(3)], 1)),
        "quat": np.stack([col[f"rot_{i}"] for i in range(4)], 1),
        "features_dc": np.stack([col[k] for k in sorted(dc)], 1)
        if dc
        else np.zeros((n, 1), np.float32),
    }

"""Camera model (pytree) and projection matrices.

Math convention: matrices act on COLUMN vectors (p' = M @ p_hom).  The
reference stores torch tensors transposed for row-vector multiplication
(scene/cameras.py:59-66, utils/graphics_utils.py:51-98); we keep the natural
convention and document the mapping.

znear/zfar match the reference (0.01 / 100, cameras.py:53-54).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def world_to_cam_matrix(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """COLMAP-style (R, t): x_cam = R^T_stored... — matches getWorld2View2.

    The reference stores R already transposed (R = qvec2rotmat(q).T,
    dataset_readers.py:89); world2view is then [[R.T, T],[0,1]]
    (graphics_utils.py:38-48).  We take the same (R, T) inputs.
    """
    w2c = np.zeros((4, 4), dtype=np.float64)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = T
    w2c[3, 3] = 1.0
    return w2c


def perspective_matrix(fovx: float, fovy: float, znear: float = ZNEAR, zfar: float = ZFAR) -> np.ndarray:
    """OpenGL-style perspective with z in [0, zfar/(zfar-znear)]-ish range and
    w' = z (graphics_utils.py:51-71).  NDC x,y in [-1, 1] after divide."""
    tx = math.tan(fovx / 2.0)
    ty = math.tan(fovy / 2.0)
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 1.0 / tx
    P[1, 1] = 1.0 / ty
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Single view; array fields are pytree leaves, H/W/fov static metadata."""

    world_to_cam: jnp.ndarray  # [4,4] p_cam = world_to_cam @ p_hom
    full_proj: jnp.ndarray  # [4,4] = perspective @ world_to_cam
    cam_center: jnp.ndarray  # [3]
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    tanfovx: float = dataclasses.field(metadata=dict(static=True))
    tanfovy: float = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tanfovy)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    height: int,
    width: int,
    dtype=jnp.float32,
) -> Camera:
    w2c = world_to_cam_matrix(np.asarray(R), np.asarray(T))
    proj = perspective_matrix(fovx, fovy) @ w2c
    c2w = np.linalg.inv(w2c)
    return Camera(
        world_to_cam=jnp.asarray(w2c, dtype=dtype),
        full_proj=jnp.asarray(proj, dtype=dtype),
        cam_center=jnp.asarray(c2w[:3, 3], dtype=dtype),
        height=int(height),
        width=int(width),
        tanfovx=float(math.tan(fovx / 2.0)),
        tanfovy=float(math.tan(fovy / 2.0)),
    )


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray = np.array([0.0, 1.0, 0.0]),
    fovx: float = math.radians(50.0),
    height: int = 256,
    width: int = 256,
    fovy: Optional[float] = None,
) -> Camera:
    """Convenience constructor for synthetic scenes/tests (z forward)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera rows: x right, y down, z forward (COLMAP convention)
    Rcw = np.stack([right, down, fwd], axis=0)  # world->cam rotation
    T = -Rcw @ eye
    if fovy is None:
        focal = fov2focal(fovx, width)
        fovy = focal2fov(focal, height)
    # make_camera expects the transposed-R convention used by the readers
    return make_camera(Rcw.T, T, fovx, fovy, height, width)


def stack_cameras(cams: list) -> Camera:
    """Stack per-view arrays into a leading batch axis (same H/W/fov only)."""
    h, w = cams[0].height, cams[0].width
    assert all(c.height == h and c.width == w for c in cams)
    return Camera(
        world_to_cam=jnp.stack([c.world_to_cam for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        cam_center=jnp.stack([c.cam_center for c in cams]),
        height=h,
        width=w,
        tanfovx=cams[0].tanfovx,
        tanfovy=cams[0].tanfovy,
    )


def index_camera(cams: Camera, i) -> Camera:
    """Select view i from a stacked Camera (jnp indexing, jit-safe)."""
    return Camera(
        world_to_cam=cams.world_to_cam[i],
        full_proj=cams.full_proj[i],
        cam_center=cams.cam_center[i],
        height=cams.height,
        width=cams.width,
        tanfovx=cams.tanfovx,
        tanfovy=cams.tanfovy,
    )

"""Full render pass: Gaussian attributes -> single-channel edge image.

Equivalent of the reference render() (gaussian_renderer/__init__.py:18-157),
re-composed TPU-first:

    preprocess (jnp, autodiff)  ->  bin_gaussians (ints, stop-grad)
        ->  build_payload (jnp gather, autodiff)  ->  tile_blend (Pallas
        custom_vjp)  ->  crop / background / clamp / dir-to-world (jnp)

Notes vs the reference:
  * colors are all-ones in the reference renderer (colors_precomp forced,
    __init__.py:96-97); we keep a color input for generality but default it
    to ones.
  * the all_map payload is [view-space main axis (flipped toward camera), 1]
    (__init__.py:98-105); channel 3 renders the alpha map.
  * `use_trained_exp` in the reference would crash for 1-channel renders
    ([H,W,1] @ [3,3]); we implement a scalar affine exposure instead, off by
    default (same as the reference's effective behavior).
  * `mean2d_offset`: a zeros [P,2] input added to the projected means; take
    jax.grad w.r.t. it to obtain the screen-space gradient statistic the
    reference collects via retain_grad on a dummy tensor (__init__.py:28-32,
    train.py:187).  The reference's stat is in NDC units (backward.cu:542-544
    scales by 0.5*W/H); multiply by 2/W, 2/H to convert.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax.numpy as jnp

from .binning import bin_gaussians, tile_grid
from .camera import Camera
from .projection import preprocess
from .quaternion import quat_to_rotmat
from .rasterize_pallas import (
    blend_train,
    build_payload,
    stack_fields,
    tile_blend,
    tile_blend_indirect,
    untile_allmap,
    untile_image,
)
from .rasterize_ref import membership, rasterize_reference

logger = logging.getLogger(__name__)

_FLAVORS = ("", "table", "indirect", "train")


def _flavor() -> str:
    """Flavor override for A/B probing the S(1) memory-space pathology
    (ROADMAP.md): "table" | "indirect" | "" (auto).  Read at trace time —
    a constant within any one jit trace; probes that flip it must use
    fresh jit instances (a cached executable never re-reads it).  The
    Mosaic K % 1024 == 0 constraint on the indirect path is hard and
    always wins."""
    f = os.environ.get("CGT_BLEND_FLAVOR", "")
    if f not in _FLAVORS:
        raise ValueError(
            f"CGT_BLEND_FLAVOR={f!r} is not one of {_FLAVORS} — refusing to "
            "silently fall back (it would invalidate an A/B measurement)"
        )
    return f


def main_axis_allmap(xyz, quat, cam: Camera) -> jnp.ndarray:
    """[P,4] view-space main-axis direction (toward camera) + ones."""
    R = quat_to_rotmat(quat)
    dir_global = R[..., :, 0]
    to_cam = cam.cam_center[None, :] - xyz
    flip = jnp.sum(dir_global * to_cam, axis=-1, keepdims=True) < 0.0
    dir_global = jnp.where(flip, -dir_global, dir_global)
    Wv = cam.world_to_cam[:3, :3]
    local = dir_global @ Wv.T
    return jnp.concatenate([local, jnp.ones_like(local[:, :1])], axis=-1)


def render(
    xyz: jnp.ndarray,  # [P,3]
    scale: jnp.ndarray,  # [P,3]
    quat: jnp.ndarray,  # [P,4]
    opacity: jnp.ndarray,  # [P]
    cam: Camera,
    bg: float | jnp.ndarray = 0.0,
    color: Optional[jnp.ndarray] = None,  # [P]
    alive: Optional[jnp.ndarray] = None,  # [P] bool, capacity padding mask
    mean2d_offset: Optional[jnp.ndarray] = None,  # [P,2]
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    render_geo: bool = True,
    compute_invdepth: bool = True,
    capacity: int = 1024,
    big_capacity: int = 1024,
    backend: str = "pallas",  # or "reference"
    exposure: Optional[jnp.ndarray] = None,  # [2] (scale, offset)
):
    """Returns dict(render [H,W], invdepth, final_T, alpha, dir [3,H,W],
    radii [P], visibility [P] bool, overflow [])."""
    H, W = cam.height, cam.width
    pre = preprocess(
        xyz,
        scale,
        quat,
        opacity,
        cam,
        scale_modifier=scale_modifier,
        antialiasing=antialiasing,
        alive=alive,
    )
    if mean2d_offset is not None:
        pre = pre._replace(mean2d=pre.mean2d + mean2d_offset)
    color_ones = color is None
    if color is None:
        color = jnp.ones_like(opacity)
    if render_geo:
        allmap = main_axis_allmap(xyz, quat, cam)
    else:
        allmap = jnp.zeros((xyz.shape[0], 4), pre.mean2d.dtype)
    bg_arr = jnp.asarray(bg, pre.mean2d.dtype).reshape(1)

    if backend == "reference":
        # candidacy is tile-granular (see rasterize_ref docstring): feed the
        # oracle the same binning membership the tiled kernel uses so the
        # two backends stay comparable bit-for-bit, truncation included
        binning = bin_gaussians(
            pre, H, W, capacity=capacity, big_capacity=big_capacity
        )
        out = rasterize_reference(
            pre, color, allmap, bg_arr[0], H, W, render_geo=render_geo,
            member=membership(binning, xyz.shape[0]),
        )
        img, invd, finT, am = (
            out["render"],
            out["invdepth"],
            out["final_T"],
            out["allmap"],
        )
        overflow = binning.overflow
    else:
        binning = bin_gaussians(
            pre, H, W, capacity=capacity, big_capacity=big_capacity
        )
        nty, ntx = tile_grid(H, W)
        train_cfg = (
            not render_geo and not compute_invdepth and color_ones
            and binning.idx_pad is not None
        )
        if backend == "pallas" and train_cfg and _flavor() in ("", "train"):
            # training channel config: payload forward + moment backward
            # with in-kernel RMW gradient reduction (blend_train) — the
            # only reduction shape that escapes XLA's Pallas-chain VMEM
            # pinning (every XLA-side gather/scatter of a kernel result
            # serializes at ~1.5 ns/element; probes s1d/s1e, ROADMAP.md)
            backend = "pallas_train"
        if backend == "pallas":
            # auto-select the blend flavor by model size (interleaved A/B on
            # v5e): small fields arrays live happily VMEM-resident and the
            # indirect kernels win ~5% (no payload gather); at large P the
            # dependent SMEM->VMEM load chain loses ~13% to the table
            # kernels' contiguous payload reads.  Mosaic also accepts the
            # indirect path's rank-1 SMEM index blocks only at K % 1024 == 0
            # (1-D arrays carry a (1024) tiling and blocks must divide it),
            # so other capacities (small tests) take the table kernels.  P
            # and K are static per capacity bucket — a trace-time constant,
            # not a runtime branch.
            forced = _flavor()
            if forced and capacity % 1024 == 0:
                indirect_ok = forced == "indirect"
            else:
                indirect_ok = capacity % 1024 == 0 and xyz.shape[0] <= 16384
            backend = "pallas_indirect" if indirect_ok else "pallas_table"
            logger.debug(
                "render: blend flavor %s (capacity=%d, P=%d, forced=%r)",
                backend, capacity, xyz.shape[0], forced,
            )
        if backend == "pallas_train":
            fields = stack_fields(
                pre, color, allmap, geo=False, invd=False, ones=True
            )
            img_p, invd_p, finT_p, am_p = blend_train(
                fields, binning.gather_idx, binning.idx_pad,
                binning.counts, bg_arr, nty, ntx,
            )
        elif backend == "pallas_table":  # contiguous per-tile payload tables
            payload = build_payload(
                pre, color, allmap, binning,
                geo=render_geo, invd=compute_invdepth, ones=color_ones,
            )
            img_p, invd_p, finT_p, am_p = tile_blend(
                payload, binning.counts, nty, ntx,
                render_geo, compute_invdepth, color_ones, bg_arr,
            )
        else:
            fields = stack_fields(
                pre, color, allmap,
                geo=render_geo, invd=compute_invdepth, ones=color_ones,
            )
            img_p, invd_p, finT_p, am_p = tile_blend_indirect(
                fields, binning.gather_idx, binning.counts, nty, ntx,
                render_geo, compute_invdepth, color_ones, bg_arr,
            )
        # kernel outputs are tiled [T*8, 128]; untile then crop padding
        img = untile_image(img_p, nty, ntx)[:H, :W]
        invd = untile_image(invd_p, nty, ntx)[:H, :W]
        finT = untile_image(finT_p, nty, ntx)[:H, :W]
        am = untile_allmap(am_p, nty, ntx)[:, :H, :W]
        overflow = binning.overflow

    if exposure is not None:
        img = img * exposure[0] + exposure[1]
    img = jnp.clip(img, 0.0, 1.0)

    # rotate rendered direction from view back to world space
    Wv = cam.world_to_cam[:3, :3]
    rend_dir = jnp.einsum("ij,ihw->jhw", Wv, am[:3])

    return {
        "render": img,
        "invdepth": invd,
        "final_T": finT,
        "alpha": am[3],
        "dir": rend_dir,
        "radii": pre.radius,
        "visibility": pre.radius > 0,
        "overflow": overflow,
        "tile_peak": binning.peak,
        "big_peak": (
            binning.big_count
            if binning.big_count is not None
            else jnp.zeros((), jnp.int32)
        ),
        "big_overflow": (
            binning.big_overflow
            if binning.big_overflow is not None
            else jnp.zeros((), jnp.int32)
        ),
    }

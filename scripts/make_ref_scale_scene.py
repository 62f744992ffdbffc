#!/usr/bin/env python
"""Fabricate a reference-scale EMAP dataset (ABC geometry) on disk.

No real ABC-NEF/Replica data ships in this environment, so this script
synthesizes one at the reference's operating point (SURVEY §6: images up to
~1600 px trained at -r 2 => ~800^2, ~50 views, meta_data.json EMAP layout,
edge_DexiNed/ maps): random Bézier/line primitives in the unit cube are
splatted by OUR renderer at full resolution and written as the "detector"
edge maps.  Training then runs the full schedule through train.py -s ... -r 2
exactly like a real scan (reference scene/dataset_readers.py:290-329,
README.md:129).

Usage:
  python scripts/make_ref_scale_scene.py --out /root/data/refscale \
      --size 1600 --views 50 --curves 24 --lines 8 [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=1600)
    p.add_argument("--height", type=int, default=None,
                   help="non-square images (e.g. 680 with --size 1200 for "
                        "the Replica protocol); default = --size")
    p.add_argument("--views", type=int, default=50)
    p.add_argument("--curves", type=int, default=24)
    p.add_argument("--lines", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--detector", default="DexiNed",
                   help="edge-map directory suffix (edge_<detector>/); the "
                        "loader substitutes color/ -> edge_<detector>/ per "
                        "ModelConfig.detector (reference "
                        "dataset_readers.py:112-121)")
    p.add_argument("--edge-blur", type=float, default=0.0,
                   help="Gaussian sigma (px) smearing the fabricated maps — "
                        "PidiNet detections are thicker/softer than DexiNed; "
                        "pair with a larger --gt-width for that protocol")
    p.add_argument("--gt-width", type=float, default=0.003)
    # detector-artifact pathologies (round 5): real DexiNed/PidiNet maps
    # are messy — edges drop out, double responses ghost alongside strong
    # edges, and isolated salt fires (reference extract_para_edge.py:49-53
    # copes with exactly this class of mess).  Fabricated stress scenes
    # let the surgery/metrics pipeline be tested against them.
    p.add_argument("--dropout-frac", type=float, default=0.0,
                   help="fraction of lit edge pixels erased in random "
                        "disk-shaped gaps per view (detector dropouts)")
    p.add_argument("--dropout-radius", type=int, default=6,
                   help="gap radius in px")
    p.add_argument("--double-edge", type=float, default=0.0,
                   help="gain of a spurious ghost copy of the edge map "
                        "shifted a few px (double-response artifact)")
    p.add_argument("--double-shift", type=int, default=4,
                   help="ghost shift in px")
    p.add_argument("--salt", type=float, default=0.0,
                   help="fraction of pixels firing as isolated salt noise")
    p.add_argument("--tile-capacity", type=int, default=1024)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.ops import bezier
    from curve_gaussian_tpu.ops.camera import fov2focal
    from curve_gaussian_tpu.ops.render import render

    rng = np.random.default_rng(args.seed)
    cp, is_bez = synthetic.random_curves(rng, args.curves, args.lines)
    W = args.size
    H = args.height or args.size
    cams = synthetic.ring_cameras(args.views, H, W)

    g = bezier.curve_gaussians(
        jnp.asarray(cp),
        jnp.full((cp.shape[0],), args.gt_width),
        jnp.asarray(is_bez),
        64,
    )
    xyz = g["xyz"].reshape(-1, 3)
    scale = g["scale"].reshape(-1, 3)
    quat = g["quat"].reshape(-1, 4)
    opa = jnp.full((xyz.shape[0],), 0.95, jnp.float32)

    edge_dir = f"edge_{args.detector}"
    os.makedirs(os.path.join(args.out, "color"), exist_ok=True)
    os.makedirs(os.path.join(args.out, edge_dir), exist_ok=True)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def render_view(w2c, proj, ctr):
        from curve_gaussian_tpu.ops.camera import Camera

        cam = Camera(
            world_to_cam=w2c, full_proj=proj, cam_center=ctr,
            height=H, width=W,
            tanfovx=cams[0].tanfovx, tanfovy=cams[0].tanfovy,
        )
        out = render(
            xyz, scale, quat, opa, cam, bg=0.0,
            capacity=args.tile_capacity, render_geo=False,
            compute_invdepth=False,
        )
        return out["render"], out["overflow"]

    frames = []
    for i, cam in enumerate(cams):
        img, ov = render_view(cam.world_to_cam, cam.full_proj, cam.cam_center)
        img = np.asarray(img)
        if int(ov):
            print(f"view {i}: overflow {int(ov)} (raise --tile-capacity)")
        vr = np.random.default_rng(args.seed * 1000 + 7919 + i)
        if args.dropout_frac > 0:
            lit = np.argwhere(img > 0.05)
            if len(lit):
                # expected erased px per gap ~ pi r^2; pick gap count so the
                # erased fraction of lit pixels matches --dropout-frac
                r = args.dropout_radius
                n_gaps = max(1, int(args.dropout_frac * len(lit)
                                    / (np.pi * r * r * 0.5)))
                centers = lit[vr.integers(0, len(lit), n_gaps)]
                pad = np.pad(img, r)
                yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
                keep = ((yy**2 + xx**2) > r * r).astype(img.dtype)
                for cy, cx in centers:  # centers are in-image => pad slices are full-size
                    pad[cy: cy + 2 * r + 1, cx: cx + 2 * r + 1] *= keep
                img = pad[r:-r, r:-r]
        if args.double_edge > 0:
            sh = args.double_shift
            dy, dx = (int(v) for v in vr.integers(-sh, sh + 1, 2))
            ghost = np.roll(img, (dy, dx), (0, 1))
            # zero the wrapped strips so the ghost does not invent edges
            # on the opposite border
            if dy > 0: ghost[:dy] = 0
            if dy < 0: ghost[dy:] = 0
            if dx > 0: ghost[:, :dx] = 0
            if dx < 0: ghost[:, dx:] = 0
            img = np.maximum(img, args.double_edge * ghost)
        if args.salt > 0:
            mask = vr.uniform(size=img.shape) < args.salt
            img = np.maximum(img, mask * vr.uniform(0.5, 1.0, img.shape))
        if args.edge_blur > 0:
            # separable Gaussian smear (host numpy): PidiNet-style soft maps
            r = max(1, int(3 * args.edge_blur))
            x = np.arange(-r, r + 1)
            k = np.exp(-(x**2) / (2 * args.edge_blur**2))
            k /= k.sum()
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), 0, img
            )
            img = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), 1, img
            )
            img /= max(img.max(), 1e-6)  # re-peak to 1 like detector output
        name = f"{i:04d}.png"
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, edge_dir, name))
        # color/ is only consulted for its path name by the loader; store the
        # same map so the directory layout matches a real EMAP export
        Image.fromarray(arr).save(os.path.join(args.out, "color", name))
        w2c = np.asarray(cam.world_to_cam, np.float64)
        K = np.array(
            [
                [fov2focal(2 * np.arctan(cam.tanfovx), W), 0.0, W / 2],
                [0.0, fov2focal(2 * np.arctan(cam.tanfovy), H), H / 2],
                [0.0, 0.0, 1.0],
            ]
        )
        frames.append(
            {
                "rgb_path": name,
                "camtoworld": np.linalg.inv(w2c).tolist(),
                "intrinsics": K.tolist(),
            }
        )
        print(f"view {i}: mean {img.mean():.4f} max {img.max():.3f}", flush=True)

    with open(os.path.join(args.out, "meta_data.json"), "w") as f:
        json.dump({"height": H, "width": W, "frames": frames}, f)
    # ground-truth primitives for post-train evaluation
    gt = {
        "curves_ctl_pts": cp[is_bez].reshape(-1, 12).tolist(),
        "lines_end_pts": cp[~is_bez][:, [0, 3], :].reshape(-1, 6).tolist(),
    }
    with open(os.path.join(args.out, "gt_edges.json"), "w") as f:
        json.dump(gt, f)
    print(f"wrote {args.views} views @ {W}x{H} -> {args.out}")


if __name__ == "__main__":
    main()

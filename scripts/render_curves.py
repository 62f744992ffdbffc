#!/usr/bin/env python
"""Render fitted parametric curves along a camera path (novel-view video).

Equivalent of the reference's --render_mv flow (eval_ABC.py:66-138,180-185):
loads parametric_edges.json + a transforms_video.json camera path and renders
each view — but by actually SPLATTING the fitted curves with the TPU
renderer rather than matplotlib scatter plots.  Frames land in
<out>/frames/; stitched to mp4 when ffmpeg exists.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--edges", required=True, help="parametric_edges.json")
    p.add_argument("--transforms", default=None,
                   help="transforms_video.json (NeRF-style); default: orbit")
    p.add_argument("--out", default="curve_video")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n-orbit", type=int, default=60)
    p.add_argument("--width", type=float, default=0.003)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n-devices", type=int, default=None,
                   help="tile-parallel rendering: shard each frame's tile "
                        "rows across N mesh devices "
                        "(parallel.sharding.tile_parallel_render)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from curve_gaussian_tpu.data.synthetic import ring_cameras
    from curve_gaussian_tpu.ops import bezier
    from curve_gaussian_tpu.ops.camera import make_camera
    from curve_gaussian_tpu.ops.render import render
    from curve_gaussian_tpu.eval.replica import stitch_video

    with open(args.edges) as f:
        edge_dict = json.load(f)
    curves = np.array(edge_dict.get("curves_ctl_pts", []),
                      np.float32).reshape(-1, 4, 3)
    lines = np.array(edge_dict.get("lines_end_pts", []),
                     np.float32).reshape(-1, 2, 3)
    line_cp = np.zeros((len(lines), 4, 3), np.float32)
    if len(lines):
        line_cp[:, 0] = lines[:, 0]
        line_cp[:, 3] = lines[:, 1]
    cp = np.concatenate([curves, line_cp]) if len(lines) else curves
    is_bez = np.zeros(len(cp), bool)
    is_bez[: len(curves)] = True
    if len(cp) == 0:
        sys.exit("no edges in json")

    m_per = 32
    g = bezier.curve_gaussians(
        jnp.asarray(cp), jnp.full((len(cp),), args.width), jnp.asarray(is_bez),
        m_per,
    )
    xyz = g["xyz"].reshape(-1, 3)
    scale = g["scale"].reshape(-1, 3)
    quat = g["quat"].reshape(-1, 4)
    opa = jnp.full((xyz.shape[0],), 0.95, jnp.float32)

    cams = []
    if args.transforms:
        with open(args.transforms) as f:
            tv = json.load(f)
        fovx = tv["camera_angle_x"]
        for fr in tv["frames"]:
            c2w = np.array(fr["transform_matrix"], dtype=np.float64)
            c2w[:3, 1:3] *= -1
            w2c = np.linalg.inv(c2w)
            cams.append(
                make_camera(w2c[:3, :3].T, w2c[:3, 3], fovx, fovx,
                            args.size, args.size)
            )
    else:
        cams = ring_cameras(args.n_orbit, args.size, args.size)

    render_tp = None
    if args.n_devices:
        from curve_gaussian_tpu.config import PipelineConfig
        from curve_gaussian_tpu.parallel.sharding import (
            tile_parallel_render_gaussians,
        )

        pipe = PipelineConfig(tile_capacity=1024)
        mesh_shape = (("data", args.n_devices),)
        gauss = {"xyz": xyz, "scale": scale, "quat": quat, "opacity": opa}

        # Camera is a pytree with static H/W/fov metadata, so it rides
        # as a plain jit arg (one trace per camera geometry, not per frame)
        @jax.jit
        def render_tp(gauss, cam_static):
            return tile_parallel_render_gaussians(
                gauss, cam_static, pipe, 0.0, mesh_shape
            )

    frame_dir = os.path.join(args.out, "frames")
    os.makedirs(frame_dir, exist_ok=True)
    for i, cam in enumerate(cams):
        if render_tp is not None:
            img = np.asarray(render_tp(gauss, cam))
        else:
            out = render(xyz, scale, quat, opa, cam, bg=0.0, capacity=1024)
            img = np.asarray(out["render"])
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(frame_dir, f"frame_{i:04d}.png")
        )
        print(f"frame {i + 1}/{len(cams)}", end="\r", flush=True)
    print()
    if stitch_video(frame_dir, os.path.join(args.out, "curves.mp4")):
        print("wrote", os.path.join(args.out, "curves.mp4"))
    else:
        print("ffmpeg not found; frames in", frame_dir)


if __name__ == "__main__":
    main()

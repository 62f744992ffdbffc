"""Host training driver: schedule, logging, checkpoints, extraction.

Orchestrates the jitted train_step + host-side surgery per the reference
schedule (train.py:38-248).  One deliberate ordering difference: the
reference runs surgery BETWEEN backward and optimizer.step(), which silently
drops that iteration's Adam update for every re-registered tensor (torch
params are replaced, their .grad is lost).  We apply the optimizer update
first and surgery after — no gradient work is discarded.
"""
from __future__ import annotations

import dataclasses
import json
import os
import random
import time
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, OptimizationConfig, PipelineConfig
from ..eval import extract as extract_mod
from ..models import curve_state as cs
from ..models import surgery
from ..ops.camera import Camera
from . import checkpoint as ckpt_mod
from .train import (
    TrainState,
    eval_render,
    init_train_state,
    train_steps_scan,
)


class JsonlLogger:
    """Metrics logger: JSONL on disk + tqdm-style stdout lines.

    Replaces the reference's TensorBoard writer (train.py:172-181); every
    scalar lands in <model_path>/metrics.jsonl for any dashboard to consume.
    """

    def __init__(self, model_path: str, quiet: bool = False):
        os.makedirs(model_path, exist_ok=True)
        self.path = os.path.join(model_path, "metrics.jsonl")
        self.f = open(self.path, "a")
        self.quiet = quiet
        self.ema: Dict[str, float] = {}

    def log(self, iteration: int, metrics: Dict[str, float], extra=None):
        row = {"iter": iteration, **{k: float(v) for k, v in metrics.items()}}
        if extra:
            row.update(extra)
        self.f.write(json.dumps(row) + "\n")
        for k, v in metrics.items():
            self.ema[k] = 0.4 * float(v) + 0.6 * self.ema.get(k, float(v))

    def progress(self, iteration: int, n_curves: int):
        if self.quiet:
            return
        ema = self.ema
        print(
            f"[{iteration:6d}] loss {ema.get('total', 0):.5f} "
            f"smo {ema.get('curve_smo', 0):.5f} "
            f"conn {ema.get('curve_conn', 0):.5f} curves {n_curves}",
            flush=True,
        )

    def close(self):
        self.f.close()


@dataclasses.dataclass
class TrainResult:
    ts: TrainState
    edge_dict: Dict
    metrics_path: str
    model_path: str


def train_scene(
    cameras: Sequence[Camera],
    edge_maps: Sequence[np.ndarray],
    seed_points: np.ndarray,
    model_cfg: ModelConfig,
    opt_cfg: OptimizationConfig,
    pipe_cfg: PipelineConfig,
    model_path: str,
    test_cameras: Sequence[Camera] = (),
    test_edge_maps: Sequence[np.ndarray] = (),
    test_iterations: Sequence[int] = (3000, 10000),
    save_iterations: Sequence[int] = (),
    checkpoint_iterations: Sequence[int] = (),
    start_checkpoint: Optional[str] = None,
    log_every: int = 10,
    quiet: bool = False,
    seed: int = 0,
    scan_chunk: int = 100,
) -> TrainResult:
    m = model_cfg.n_gaussians
    state = cs.init_state(seed_points, n_views=len(cameras), n_gaussians=m)
    ts = init_train_state(state)
    first_iter = 0
    if start_checkpoint:
        cap, step = ckpt_mod.checkpoint_capacity(start_checkpoint)
        if cap != state.capacity:
            state = cs.init_state(
                seed_points, n_views=len(cameras), n_gaussians=m, capacity=cap
            )
            ts = init_train_state(state)
        ts = ckpt_mod.load_checkpoint(start_checkpoint, ts)
        first_iter = int(ts.step)

    bg_val = 1.0 if model_cfg.white_background else 0.0
    rng = random.Random(seed)
    if opt_cfg.random_background:
        bg_val = rng.random()
    bg = jnp.asarray(bg_val, jnp.float32)

    if not all(
        c.height == cameras[0].height and c.width == cameras[0].width
        for c in cameras
    ):
        raise ValueError(
            "train_scene requires uniform image sizes across views (the "
            "scanned training step batches cameras); resize with -r or "
            "split the scene"
        )
    logger = JsonlLogger(model_path, quiet=quiet)
    save_scene_artifacts(cameras, seed_points, model_path)
    # device-resident stacks; per-chunk views are gathered on device
    gt_all = jnp.stack([jnp.asarray(e) for e in edge_maps])
    w2c_all = jnp.stack([c.world_to_cam for c in cameras])
    proj_all = jnp.stack([c.full_proj for c in cameras])
    ctr_all = jnp.stack([c.cam_center for c in cameras])
    cam_geom = (
        cameras[0].height,
        cameras[0].width,
        cameras[0].tanfovx,
        cameras[0].tanfovy,
    )
    view_stack: List[int] = []
    t_start = time.time()

    # host-event boundaries: every iteration where surgery fires, plus the
    # explicit test/save/checkpoint sets and the use_mask flip
    events = set()
    for i in range(first_iter + 1, opt_cfg.iterations + 1):
        if surgery.schedule_fires(i, opt_cfg) or i == opt_cfg.densify_until_iter:
            events.add(i)
    events.update(t for t in test_iterations)
    events.update(t for t in save_iterations)
    events.update(t for t in checkpoint_iterations)
    events.add(opt_cfg.iterations)

    iteration = first_iter
    while iteration < opt_cfg.iterations:
        next_event = min(
            [e for e in events if e > iteration] or [opt_cfg.iterations]
        )
        k = min(next_event - iteration, scan_chunk)
        idxs = []
        for _ in range(k):
            if not view_stack:
                view_stack = list(range(len(cameras)))
            idxs.append(view_stack.pop(rng.randrange(len(view_stack))))
        vi = jnp.asarray(idxs, jnp.int32)
        use_mask = (iteration + 1) >= opt_cfg.densify_until_iter
        t_chunk = time.time()
        ts, metrics = train_steps_scan(
            ts,
            (w2c_all[vi], proj_all[vi], ctr_all[vi]),
            gt_all[vi],
            bg,
            opt_cfg,
            pipe_cfg,
            use_mask=use_mask,
            n_gaussians=m,
            cam_geom=cam_geom,
        )
        metrics = {kk: np.asarray(v) for kk, v in metrics.items()}
        # per-iteration wall time (the reference's iter_time TB scalar)
        metrics["iter_time"] = np.full(
            k, (time.time() - t_chunk) / k, np.float32
        )
        for j in range(k):
            it_j = iteration + 1 + j
            if it_j % log_every == 0:
                logger.log(it_j, {kk: v[j] for kk, v in metrics.items()})
        iteration += k
        if iteration % (log_every * 50) < k:
            logger.progress(iteration, int(jnp.sum(ts.alive)))

        ts2 = surgery.apply_schedule(ts, iteration, opt_cfg)
        if ts2 is not ts:
            ts = ts2
            if not quiet:
                print(
                    f"[{iteration:6d}] surgery -> {int(jnp.sum(ts.alive))} curves"
                    f" (capacity {ts.alive.shape[0]})",
                    flush=True,
                )

        if iteration in test_iterations and test_cameras:
            l1s, psnrs = [], []
            for tc, tg in zip(test_cameras, test_edge_maps):
                out = eval_render(
                    ts, tc, pipe_cfg, bg, use_mask=use_mask, n_gaussians=m,
                    mask_threshold=opt_cfg.mask_threshold,
                )
                img = np.asarray(out["render"])
                l1s.append(float(np.abs(img - tg).mean()))
                mse = float(np.mean((img - tg) ** 2))
                psnrs.append(-10.0 * np.log10(mse + 1e-12))
            logger.log(
                iteration,
                {"test_l1": np.mean(l1s), "test_psnr": np.mean(psnrs)},
            )
            if not quiet:
                print(
                    f"[{iteration:6d}] test L1 {np.mean(l1s):.5f} "
                    f"PSNR {np.mean(psnrs):.2f}",
                    flush=True,
                )

        if iteration in save_iterations:
            save_model_artifacts(ts, model_path, iteration)
        if iteration in checkpoint_iterations:
            ckpt_mod.save_checkpoint(
                os.path.join(model_path, f"chkpnt{iteration}.npz"), ts
            )

    wall = time.time() - t_start
    done = int(ts.step) - first_iter
    if not quiet and done:
        print(f"training done: {done} iters in {wall:.1f}s "
              f"({done / wall:.2f} it/s)", flush=True)

    host = surgery.extract(ts)
    edge_dict = extract_mod.curves_to_edge_dict(
        host, merge_endpoints_flag=opt_cfg.merge_endpoints_flag
    )
    if opt_cfg.visible_checking:
        edge_dict = extract_mod.filter_visible_edges(
            edge_dict, cameras, edge_maps
        )
    extract_mod.save_parametric_edges(edge_dict, model_path)
    pts, _ = extract_mod.sample_edge_dict(edge_dict)
    if len(pts):
        extract_mod.save_edge_points_ply(pts, model_path)
    logger.close()
    return TrainResult(
        ts=ts, edge_dict=edge_dict, metrics_path=logger.path,
        model_path=model_path,
    )


def save_scene_artifacts(cameras, seed_points, model_path: str):
    """input.ply + cameras.json (reference scene/__init__.py:60-72,
    utils/camera_utils.py:78-98)."""
    from ..data.ply import write_ply

    os.makedirs(model_path, exist_ok=True)
    write_ply(
        os.path.join(model_path, "input.ply"), np.asarray(seed_points)
    )
    entries = []
    for i, cam in enumerate(cameras):
        w2c = np.asarray(cam.world_to_cam, np.float64)
        c2w = np.linalg.inv(w2c)
        entries.append(
            {
                "id": i,
                "img_name": f"{i:05d}",
                "width": cam.width,
                "height": cam.height,
                "position": c2w[:3, 3].tolist(),
                "rotation": [r.tolist() for r in c2w[:3, :3]],
                "fx": cam.width / (2.0 * cam.tanfovx),
                "fy": cam.height / (2.0 * cam.tanfovy),
            }
        )
    with open(os.path.join(model_path, "cameras.json"), "w") as f:
        json.dump(entries, f)


def save_model_artifacts(ts: TrainState, model_path: str, iteration: int):
    """Curve point-cloud + per-Gaussian cloud snapshots (the reference's
    draw_curve / save_ply, gaussian_curve_model.py:712-727)."""
    from ..data.ply import write_ply
    from ..models.curve_state import CurveState, gaussians

    out_dir = os.path.join(model_path, f"point_cloud/iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    host = surgery.extract(ts)
    if host.n == 0:
        return
    t = np.linspace(0, 1, 200)
    pts = surgery.np_curve_points(
        host.params["curve_points"], t, host.is_bezier
    ).reshape(-1, 3)
    colors = np.random.default_rng(0).uniform(0.2, 1.0, size=(host.n, 3))
    colors = np.repeat(colors, len(t), axis=0)
    write_ply(os.path.join(out_dir, f"curve_step{iteration}.ply"), pts, colors)

    state = CurveState(
        **{k: jnp.asarray(v) for k, v in host.params.items()},
        exposure=ts.params["exposure"],
        is_bezier=jnp.asarray(host.is_bezier),
        alive=jnp.ones((host.n,), bool),
    )
    g = gaussians(state)
    write_ply(
        os.path.join(out_dir, "gaussians.ply"),
        np.asarray(g["xyz"]),
        normals=np.asarray(g["tangent"]),
    )
    # 3DGS-format cloud for viewer interop (reference save_ply,
    # gaussian_model.py:383-400) + per-view exposure (scene/__init__.py:94-103)
    from ..models.gaussian_ply import save_gaussian_ply

    save_gaussian_ply(
        os.path.join(out_dir, "point_cloud.ply"),
        np.asarray(g["xyz"]),
        np.asarray(g["opacity"]),
        np.asarray(g["scale"]),
        np.asarray(g["quat"]),
    )
    exposure = np.asarray(ts.params["exposure"])
    with open(os.path.join(model_path, "exposure.json"), "w") as f:
        json.dump(
            {str(i): exposure[i].tolist() for i in range(len(exposure))}, f
        )

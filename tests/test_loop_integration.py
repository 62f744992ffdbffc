"""End-to-end train_scene integration on CPU: compressed schedule exercising
scan chunks, surgery events, test renders, artifacts, and extraction."""
import dataclasses
import json
import os

import numpy as np
import pytest

from curve_gaussian_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine.loop import train_scene


@pytest.mark.slow
def test_train_scene_end_to_end(tmp_path):
    scene = synthetic.make_scene(
        seed=5, n_curves=3, n_lines=1, n_views=4, height=96, width=128,
        capacity=256,
    )
    opt = dataclasses.replace(
        OptimizationConfig(),
        iterations=60,
        densify_from_iter=5,
        densify_until_iter=30,
        densification_interval=20,
        conn_from_iter=30,
        position_lr_max_steps=180,
    )
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    model = ModelConfig(n_gaussians=8)
    seed_pts = scene.curves.mean(axis=1).astype(np.float32)
    out = str(tmp_path / "run")
    result = train_scene(
        scene.cameras,
        scene.edge_maps,
        seed_pts,
        model,
        opt,
        pipe,
        out,
        test_cameras=scene.cameras[:1],
        test_edge_maps=scene.edge_maps[:1],
        test_iterations=(60,),
        save_iterations=(60,),
        checkpoint_iterations=(60,),
        quiet=True,
        scan_chunk=16,
    )
    assert int(result.ts.step) == 60
    # artifacts
    for f in (
        "metrics.jsonl",
        "parametric_edges.json",
        "cameras.json",
        "input.ply",
        "chkpnt60.npz",
        "exposure.json",
        "point_cloud/iteration_60/point_cloud.ply",
    ):
        assert os.path.exists(os.path.join(out, f)), f
    with open(os.path.join(out, "metrics.jsonl")) as fh:
        rows = [json.loads(l) for l in fh]
    iters = [r["iter"] for r in rows if "total" in r]
    assert max(iters) == 60
    totals = [r["total"] for r in rows if "total" in r]
    assert np.isfinite(totals).all()
    n_edges = len(result.edge_dict["curves_ctl_pts"]) + len(
        result.edge_dict["lines_end_pts"]
    )
    assert n_edges >= 1

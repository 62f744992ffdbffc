"""Data layer + extraction + metrics tests, including an EMAP-format
dataset round-trip written to disk."""
import json
import os

import numpy as np
import pytest

from curve_gaussian_tpu.config import ModelConfig
from curve_gaussian_tpu.data.ply import read_ply, write_ply
from curve_gaussian_tpu.eval import metrics as M
from curve_gaussian_tpu.eval.extract import (
    bezier_length,
    curves_to_edge_dict,
    sample_edge_dict,
)
from curve_gaussian_tpu.models import fitting


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "t.ply")
    write_ply(p, pts, colors=cols)
    back = read_ply(p)
    np.testing.assert_allclose(back["points"], pts, atol=1e-6)
    np.testing.assert_allclose(back["colors"], cols, atol=1 / 255)
    # ascii too
    p2 = str(tmp_path / "t2.ply")
    write_ply(p2, pts, ascii=True)
    np.testing.assert_allclose(read_ply(p2)["points"], pts, atol=1e-5)


def test_sampling_density():
    # a straight "bezier" of length 0.6 sampled at 5mm -> ~120 points
    p0 = np.zeros(3)
    p3 = np.array([0.6, 0, 0])
    cp = np.stack([p0, p0 + (p3 - p0) / 3, p0 + 2 * (p3 - p0) / 3, p3])
    assert abs(bezier_length(cp) - 0.6) < 1e-3
    d = {"curves_ctl_pts": [cp.reshape(12).tolist()], "lines_end_pts": []}
    pts, dirs = sample_edge_dict(d, with_directions=True)
    assert 115 <= len(pts) <= 121
    np.testing.assert_allclose(np.abs(dirs @ np.array([1.0, 0, 0])), 1, atol=1e-5)


def test_metrics_perfect_match(rng):
    pts = rng.uniform(0.1, 0.9, size=(500, 3)).astype(np.float32)
    res = M.evaluate_edges(pts, pts, voxel_downsample=False)
    assert res["chamfer"] < 1e-6
    assert res["fscore_0.005"] == 1.0
    assert res["IOU_0.02"] == 1.0


def test_metrics_detect_offset(rng):
    gt = rng.uniform(0.1, 0.9, size=(500, 3)).astype(np.float32)
    pred = gt + np.array([0.008, 0, 0], np.float32)
    res = M.evaluate_edges(pred, gt, voxel_downsample=False)
    assert res["precision_0.005"] < 0.5
    assert res["precision_0.01"] > 0.9
    assert 0.015 < res["chamfer"] < 0.017


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 1, size=(20000, 3)).astype(np.float32)
    ds = M.downsample_voxel_average(pts, 16, (0, 0, 0), (1, 1, 1))
    assert len(ds) <= 16**3
    assert len(ds) > 1000


def test_emap_dataset_roundtrip(tmp_path):
    """Write an EMAP-format scene to disk; load_scene must reproduce it."""
    from PIL import Image

    from curve_gaussian_tpu.data.dataset import load_scene

    root = tmp_path / "scene"
    (root / "color").mkdir(parents=True)
    (root / "edge_DexiNed").mkdir()
    h, w = 64, 80
    frames = []
    rng = np.random.default_rng(0)
    for i in range(3):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.5, 0.5, -2.0 + 0.1 * i]
        K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
        name = f"{i:03d}.png"
        frames.append(
            {
                "rgb_path": name,
                "camtoworld": c2w.tolist(),
                "intrinsics": K.tolist(),
            }
        )
        img = (rng.uniform(size=(h, w)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "edge_DexiNed" / name)
        Image.fromarray(img).save(root / "color" / name)
    meta = {"height": h, "width": w, "frames": frames}
    with open(root / "meta_data.json", "w") as f:
        json.dump(meta, f)

    cfg = ModelConfig(source_path=str(root), resolution=1)
    scene = load_scene(cfg)
    assert len(scene.train_cameras) == 3
    assert scene.train_edge_maps[0].shape == (h, w)
    assert scene.seed_points.shape == (15**3, 3)
    cam = scene.train_cameras[0]
    assert cam.height == h and cam.width == w
    # focal 100px, width 80 -> tanfovx = 40/100
    assert abs(cam.tanfovx - 0.4) < 1e-6
    np.testing.assert_allclose(
        np.asarray(cam.cam_center), [0.5, 0.5, -2.0], atol=1e-5
    )


def test_curves_to_edge_dict_merges_endpoints(rng):
    from curve_gaussian_tpu.engine import train as T
    from curve_gaussian_tpu.models import curve_state as cs, surgery

    pts = rng.uniform(0.3, 0.7, size=(5, 3)).astype(np.float32)
    state = cs.init_state(pts, n_views=1, n_gaussians=12, capacity=256)
    ts = T.init_train_state(state)
    host = surgery.extract(ts)
    host.is_bezier[3:] = False
    d = curves_to_edge_dict(host)
    assert len(d["curves_ctl_pts"]) == 3
    assert len(d["lines_end_pts"]) == 2


def test_emap_sparse_sfm_seed(tmp_path):
    import numpy as np

    from curve_gaussian_tpu.data.dataset import _emap_seed_points

    root = str(tmp_path)
    pts = np.random.default_rng(0).uniform(0, 1, size=(50, 3))
    np.savetxt(root + "/sparse_sfm_points.txt", pts)
    seed = _emap_seed_points(root)
    assert seed.shape == (8001, 3)
    np.testing.assert_allclose(seed[:50], pts, atol=1e-5)
    # without the file: default grid
    seed2 = _emap_seed_points(str(tmp_path / "nope"))
    assert seed2.shape == (15**3, 3)


def _write_emap_scene(root, maps, h, w):
    """Minimal EMAP-format scene with the given edge PNGs."""
    from PIL import Image

    (root / "color").mkdir(parents=True)
    (root / "edge_DexiNed").mkdir()
    frames = []
    for i, m in enumerate(maps):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.5, 0.5, -2.0 + 0.1 * i]
        K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
        name = f"{i:03d}.png"
        frames.append(
            {"rgb_path": name, "camtoworld": c2w.tolist(),
             "intrinsics": K.tolist()}
        )
        img = (np.clip(m, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "edge_DexiNed" / name)
        Image.fromarray(img).save(root / "color" / name)
    with open(root / "meta_data.json", "w") as f:
        json.dump({"height": h, "width": w, "frames": frames}, f)


def test_inverted_edge_polarity_autodetected(tmp_path):
    """Dark-edges-on-white detector dumps load as bright-on-dark under
    invert_edges='auto' (the reference's own DexiNed handling inverts,
    extract_para_edge.py:49-53), restoring the exact maps the standard
    (convergence-tested) path trains on; 'off' preserves the stored
    polarity; 'on' always inverts."""
    from curve_gaussian_tpu.data.dataset import load_scene

    h, w = 48, 64
    rng = np.random.default_rng(3)
    # sparse bright edges on dark background (mean ~0.05), like a detector
    orig = []
    for _ in range(3):
        m = np.zeros((h, w), np.float32)
        ys = rng.integers(0, h, 150)
        xs = rng.integers(0, w, 150)
        m[ys, xs] = rng.uniform(0.5, 1.0, 150).astype(np.float32)
        orig.append(m)

    root = tmp_path / "inv"
    _write_emap_scene(root, [1.0 - m for m in orig], h, w)
    scene = load_scene(ModelConfig(source_path=str(root), resolution=1))
    for got, want in zip(scene.train_edge_maps, orig):
        np.testing.assert_allclose(got, want, atol=1.5 / 255)

    scene_off = load_scene(
        ModelConfig(source_path=str(root), resolution=1, invert_edges="off")
    )
    assert scene_off.train_edge_maps[0].mean() > 0.6  # stored polarity kept

    root2 = tmp_path / "fwd"
    _write_emap_scene(root2, orig, h, w)
    scene_fwd = load_scene(ModelConfig(source_path=str(root2), resolution=1))
    for got, want in zip(scene_fwd.train_edge_maps, orig):
        np.testing.assert_allclose(got, want, atol=1.5 / 255)  # no flip
    scene_on = load_scene(
        ModelConfig(source_path=str(root2), resolution=1, invert_edges="on")
    )
    np.testing.assert_allclose(
        scene_on.train_edge_maps[0], 1.0 - orig[0], atol=1.5 / 255
    )


@pytest.mark.slow
def test_inverted_scene_trains(tmp_path):
    """Short end-to-end: a dark-on-white fabricated scene loaded with
    polarity auto-detect still converges (loss decreases)."""
    import dataclasses

    import jax.numpy as jnp

    from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.data.dataset import load_scene
    from curve_gaussian_tpu.engine import train as T
    from curve_gaussian_tpu.models import curve_state as cs

    syn = synthetic.make_scene(
        seed=4, n_curves=2, n_lines=0, n_views=3, height=64, width=64,
        capacity=256,
    )
    root = tmp_path / "scene"
    _write_emap_scene(root, [1.0 - m for m in syn.edge_maps], 64, 64)
    scene = load_scene(ModelConfig(source_path=str(root), resolution=1))
    assert scene.train_edge_maps[0].mean() < 0.5  # polarity restored

    pts = syn.curves.mean(axis=1).astype(np.float32)
    state = cs.init_state(pts, n_views=3, n_gaussians=12,
                          capacity=cs.MIN_CAPACITY)
    ts = T.init_train_state(state)
    opt = dataclasses.replace(OptimizationConfig(), lambda_points_conn=0.0)
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    losses = []
    # cameras from the synthetic scene (the EMAP file's cameras are dummies;
    # this test exercises polarity -> optimization, not pose recovery)
    for i in range(80):
        cam = syn.cameras[i % 3]
        gt = jnp.asarray(scene.train_edge_maps[i % 3])
        ts, metrics = T.train_step(
            ts, cam, gt, jnp.zeros(()), opt, pipe, use_mask=False,
            n_gaussians=12,
        )
        losses.append(float(metrics["total"]))
    assert np.mean(losses[-12:]) < 0.9 * np.mean(losses[:12]), (
        np.mean(losses[:12]), np.mean(losses[-12:]))

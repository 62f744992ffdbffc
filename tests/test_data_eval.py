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

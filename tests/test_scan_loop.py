"""train_steps_scan must reproduce individual train_step chains exactly."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs


@pytest.mark.slow
def test_scan_equals_stepwise(rng):
    import __graft_entry__ as ge

    cams, gts, state = ge._tiny_problem(3)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())
    K = 6
    order = [0, 1, 2, 2, 0, 1]

    ts_a = T.init_train_state(jax.tree.map(jnp.copy, state))
    for i in order:
        ts_a, m_a = T.train_step(
            ts_a, cams[i], gts[i], bg, opt, pipe, use_mask=False, n_gaussians=8
        )

    ts_b = T.init_train_state(jax.tree.map(jnp.copy, state))
    w2c = jnp.stack([cams[i].world_to_cam for i in order])
    proj = jnp.stack([cams[i].full_proj for i in order])
    ctr = jnp.stack([cams[i].cam_center for i in order])
    gtb = jnp.stack([gts[i] for i in order])
    geom = (cams[0].height, cams[0].width, cams[0].tanfovx, cams[0].tanfovy)
    ts_b, m_b = T.train_steps_scan(
        ts_b, (w2c, proj, ctr), gtb, bg, opt, pipe, use_mask=False,
        n_gaussians=8, cam_geom=geom,
    )
    assert m_b["total"].shape == (K,)
    np.testing.assert_allclose(
        float(m_a["total"]), float(m_b["total"][-1]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ts_a.params["curve_points"]),
        np.asarray(ts_b.params["curve_points"]),
        atol=1e-6,
    )
    assert int(ts_b.step) == K


@pytest.mark.slow
def test_scan_n_active_padding(rng):
    """Padded steps (>= n_active) must be exact no-ops on the state."""
    import __graft_entry__ as ge

    cams, gts, state = ge._tiny_problem(2)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())
    geom = (cams[0].height, cams[0].width, cams[0].tanfovx, cams[0].tanfovy)
    order = [0, 1, 0, 1]  # K=4 padded, only first 2 active

    ts_a = T.init_train_state(jax.tree.map(jnp.copy, state))
    for i in order[:2]:
        ts_a, _ = T.train_step(
            ts_a, cams[i], gts[i], bg, opt, pipe, use_mask=False, n_gaussians=8
        )

    ts_b = T.init_train_state(jax.tree.map(jnp.copy, state))
    w2c = jnp.stack([cams[i].world_to_cam for i in order])
    proj = jnp.stack([cams[i].full_proj for i in order])
    ctr = jnp.stack([cams[i].cam_center for i in order])
    gtb = jnp.stack([gts[i] for i in order])
    ts_b, m = T.train_steps_scan(
        ts_b, (w2c, proj, ctr), gtb, bg, opt, pipe, use_mask=False,
        n_gaussians=8, cam_geom=geom, n_active=jnp.asarray(2, jnp.int32),
    )
    assert int(ts_b.step) == 2  # step counter frozen on padded steps
    for a, b in zip(jax.tree.leaves(ts_a), jax.tree.leaves(ts_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_replica_overlays(tmp_path, rng):
    import json

    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.eval.replica import evaluate_replica

    cams = synthetic.ring_cameras(3, 48, 128)
    maps = [rng.uniform(size=(48, 128)).astype(np.float32) for _ in cams]
    edge_dict = {
        "lines_end_pts": [[0.3, 0.5, 0.5, 0.7, 0.5, 0.5]],
        "curves_ctl_pts": [],
    }
    p = tmp_path / "parametric_edges.json"
    with open(p, "w") as f:
        json.dump(edge_dict, f)
    stats = evaluate_replica(str(p), cams, maps, str(tmp_path / "overlay"))
    assert stats["n_lines"] == 1
    assert stats["n_frames"] == 3
    import os

    assert os.path.exists(tmp_path / "overlay" / "frame_0000.png")

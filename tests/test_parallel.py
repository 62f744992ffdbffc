"""Multi-device (virtual CPU mesh) tests for the sharded training path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.parallel import sharding as ps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _problem(n_views, height=16, width=128):
    import __graft_entry__ as ge

    return ge._tiny_problem(n_views, height, width)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_parallel_matches_single_device():
    """An 8-view parallel step must equal a single-device 8-view-mean step.

    We verify via the parallel step on a 1-device mesh vs an 8-device mesh:
    identical view batch => identical parameter update."""
    cams, gts, state = _problem(8)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(tile_capacity=256)
    geom = (cams[0].height, cams[0].width, cams[0].tanfovx, cams[0].tanfovy)
    results = []
    for ndev in (1, 8):
        mesh = ps.make_mesh(ndev)
        # rebuild state each round: parallel_train_step donates its input
        ts = T.init_train_state(jax.tree.map(jnp.copy, state))
        cam_arrays = ps.camera_batch_arrays(cams, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        gt_batch = jax.device_put(
            jnp.stack(gts), NamedSharding(mesh, P("data"))
        )
        ts2, metrics = ps.parallel_train_step(
            ts,
            cam_arrays,
            gt_batch,
            jnp.zeros(()),
            opt_cfg,
            pipe_cfg,
            use_mask=False,
            mesh_shape=(("data", ndev),),
            cam_geom=geom,
        )
        results.append((float(metrics["total"]),
                        np.asarray(ts2.params["curve_points"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)


@pytest.mark.slow
def test_parallel_scan_matches_single_device_trajectory():
    """A K-step, B-view/step chunk on the 8-device mesh must reproduce the
    single-device same-effective-batch trajectory (loss sequence + params)."""
    K, B = 3, 8
    cams, gts, state = _problem(B)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(tile_capacity=256)
    geom = (cams[0].height, cams[0].width, cams[0].tanfovx, cams[0].tanfovy)
    w2c = jnp.stack([c.world_to_cam for c in cams])
    proj = jnp.stack([c.full_proj for c in cams])
    ctr = jnp.stack([c.cam_center for c in cams])
    gt = jnp.stack(gts)
    vi = (jnp.arange(K * B, dtype=jnp.int32).reshape(K, B) * 3) % B
    results = []
    for ndev in (1, 8):
        ts = T.init_train_state(jax.tree.map(jnp.copy, state))
        ts2, metrics = ps.parallel_train_steps_scan(
            ts,
            (w2c[vi], proj[vi], ctr[vi]),
            gt[vi.reshape(-1)].reshape(K, B, *gt.shape[1:]),
            jnp.zeros(()),
            opt_cfg,
            pipe_cfg,
            use_mask=False,
            mesh_shape=(("data", ndev),),
            cam_geom=geom,
        )
        assert int(ts2.step) == K
        results.append(
            (np.asarray(metrics["total"]), np.asarray(ts2.params["curve_points"]))
        )
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)


@pytest.mark.slow
def test_train_scene_views_per_step(tmp_path):
    """Driver-level integration: train_scene on the parallel path (B views
    per optimizer step over the virtual mesh) runs the full schedule."""
    import dataclasses as dc

    from curve_gaussian_tpu.config import ModelConfig
    from curve_gaussian_tpu.data import synthetic
    from curve_gaussian_tpu.engine.loop import train_scene

    scene = synthetic.make_scene(
        seed=1, n_curves=2, n_lines=1, n_views=8, height=32, width=128,
        capacity=64,
    )
    opt = dc.replace(
        OptimizationConfig(),
        iterations=8,
        densify_from_iter=2,
        densify_until_iter=4,
        conn_from_iter=4,
        densification_interval=2,
        split_interval=4,
        merge_interval=4,
        prune_trim_interval=4,
    )
    res = train_scene(
        scene.cameras,
        scene.edge_maps,
        scene.curves.mean(axis=1).astype(np.float32),
        ModelConfig(n_gaussians=8),
        opt,
        PipelineConfig(tile_capacity=64),
        str(tmp_path / "dp"),
        quiet=True,
        scan_chunk=4,
        views_per_step=4,
        n_devices=4,
    )
    assert int(res.ts.step) == 8


@pytest.mark.slow
def test_tile_parallel_render_matches_single():
    cams, gts, state = _problem(1, height=64, width=256)
    ts = T.init_train_state(state)
    pipe_cfg = PipelineConfig(tile_capacity=256)
    c0 = cams[0]
    img8 = ps.tile_parallel_render(
        ts,
        (c0.world_to_cam, c0.full_proj, c0.cam_center),
        (c0.height, c0.width, c0.tanfovx, c0.tanfovy),
        pipe_cfg,
        jnp.zeros(()),
        mesh_shape=(("data", 8),),
        n_gaussians=8,
    )
    out1 = T.eval_render(
        ts, c0, pipe_cfg, jnp.zeros(()), n_gaussians=8
    )
    np.testing.assert_allclose(
        np.asarray(img8), np.asarray(out1["render"]), atol=2e-5
    )

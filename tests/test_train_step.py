"""End-to-end training smoke tests: loss decreases when fitting curves to
synthetic edge maps through the full jitted train step."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.data import synthetic
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(
        seed=3, n_curves=3, n_lines=0, n_views=4, height=96, width=128,
        capacity=256,
    )


def test_loss_decreases(scene):
    # init curves near GT (perturbed) so a short run shows clear progress
    rng = np.random.default_rng(0)
    pts = scene.curves.mean(axis=1) + rng.normal(0, 0.02, size=(3, 3)).astype(
        np.float32
    )
    state = cs.init_state(pts, n_views=len(scene.cameras), n_gaussians=12,
                          capacity=cs.MIN_CAPACITY)
    ts = T.init_train_state(state)
    opt = dataclasses.replace(OptimizationConfig(), lambda_points_conn=0.0)
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())

    losses = []
    for i in range(60):
        cam = scene.cameras[i % len(scene.cameras)]
        gt = jnp.asarray(scene.edge_maps[i % len(scene.cameras)])
        ts, metrics = T.train_step(
            ts, cam, gt, bg, opt, pipe, use_mask=False, n_gaussians=12
        )
        losses.append(float(metrics["total"]))
    first = np.mean(losses[:8])
    last = np.mean(losses[-8:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, (first, last)
    # densify stats accumulated for visible gaussians
    assert float(jnp.sum(ts.denom)) > 0
    assert int(ts.step) == 60


@pytest.mark.slow
def test_masked_capacity_invariance(scene):
    """Same init at two capacities gives identical first-step loss."""
    pts = scene.curves.mean(axis=1).astype(np.float32)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())
    outs = []
    for cap in (cs.MIN_CAPACITY, cs.MIN_CAPACITY * 2):
        state = cs.init_state(pts, n_views=1, n_gaussians=12, capacity=cap)
        ts = T.init_train_state(state)
        _, metrics = T.train_step(
            ts, scene.cameras[0], jnp.asarray(scene.edge_maps[0]), bg, opt,
            pipe, use_mask=False, n_gaussians=12
        )
        outs.append(float(metrics["total"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)


def test_use_mask_path(scene):
    pts = scene.curves.mean(axis=1).astype(np.float32)
    state = cs.init_state(pts, n_views=1, n_gaussians=12,
                          capacity=cs.MIN_CAPACITY)
    ts = T.init_train_state(state)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    ts, metrics = T.train_step(
        ts, scene.cameras[0], jnp.asarray(scene.edge_maps[0]),
        jnp.zeros(()), opt, pipe, use_mask=True, n_gaussians=12
    )
    assert "mask" in metrics and np.isfinite(float(metrics["mask"]))
    assert "curve_conn" in metrics
    assert np.isfinite(float(metrics["total"]))

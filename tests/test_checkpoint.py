"""Checkpoint/resume: full-pytree roundtrip and training continuation."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from curve_gaussian_tpu.config import OptimizationConfig, PipelineConfig
from curve_gaussian_tpu.engine import checkpoint as C
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs


def _ts(rng, n=6):
    pts = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    state = cs.init_state(pts, n_views=2, n_gaussians=8, capacity=cs.MIN_CAPACITY)
    return T.init_train_state(state)


def test_roundtrip_preserves_everything(tmp_path, rng):
    import __graft_entry__ as ge

    cams, gts, state = ge._tiny_problem(2)
    ts = T.init_train_state(state)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    for i in range(3):
        ts, _ = T.train_step(
            ts, cams[i % 2], gts[i % 2], jnp.zeros(()), opt, pipe,
            use_mask=False, n_gaussians=8,
        )
    path = str(tmp_path / "ck.npz")
    C.save_checkpoint(path, ts)
    template = T.init_train_state(
        cs.init_state(rng.uniform(0.2, 0.8, size=(4, 3)).astype(np.float32),
                      n_views=2, n_gaussians=8, capacity=cs.MIN_CAPACITY)
    )
    ts2 = C.load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cap, step = C.checkpoint_capacity(path)
    assert cap == cs.MIN_CAPACITY
    assert step == 3


def test_resume_continues_identically(tmp_path, rng):
    """step 0..6 in one go == step 0..3, checkpoint, restore, 4..6."""
    import __graft_entry__ as ge

    cams, gts, state = ge._tiny_problem(2)
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())

    def run(ts, a, b):
        for i in range(a, b):
            ts, _ = T.train_step(
                ts, cams[i % 2], gts[i % 2], bg, opt, pipe,
                use_mask=False, n_gaussians=8,
            )
        return ts

    ts_full = run(T.init_train_state(jax.tree.map(jnp.copy, state)), 0, 6)
    ts_half = run(T.init_train_state(jax.tree.map(jnp.copy, state)), 0, 3)
    path = str(tmp_path / "ck.npz")
    C.save_checkpoint(path, ts_half)
    ts_res = C.load_checkpoint(
        path, T.init_train_state(jax.tree.map(jnp.copy, state))
    )
    ts_res = run(ts_res, 3, 6)
    np.testing.assert_allclose(
        np.asarray(ts_full.params["curve_points"]),
        np.asarray(ts_res.params["curve_points"]),
        atol=1e-7,
    )
    np.testing.assert_array_equal(int(ts_full.step), int(ts_res.step))

"""Learned per-view exposure (reference train_test_exp).

The reference applies a learned per-image exposure to the rendered image
during training (train.py:95, gaussian_renderer/__init__.py:132-135) and
steps a separate exposure optimizer (train.py:226-236).  Here exposure is a
[V, 2] scalar-affine parameter updated by the same Adam; these tests pin:

  * gradients flow to exactly the rendered view's exposure row;
  * a deliberately exposure-shifted GT is recovered by the exposure alone
    (all other groups LR-frozen);
  * the default-off path leaves exposure untouched (bitwise).
"""
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
        seed=5, n_curves=3, n_lines=0, n_views=4, height=64, width=64,
        capacity=256,
    )


def _fresh_ts(scene, n_views=4):
    pts = scene.curves.mean(axis=1).astype(np.float32)
    state = cs.init_state(
        pts, n_views=n_views, n_gaussians=12, capacity=cs.MIN_CAPACITY
    )
    return T.init_train_state(state)


# every group except exposure LR-frozen: the only way to fit a globally
# exposure-shifted GT is through the exposure row itself
_EXPOSURE_ONLY = dict(
    lr_curve_points_init=1e-12,
    lr_curve_points_final=1e-12,
    feature_lr=0.0,
    opacity_lr=0.0,
    scaling_lr=0.0,
    mask_lr=0.0,
    exposure_lr_init=0.05,
    exposure_lr_final=0.05,
)


def test_exposure_grad_localized(scene):
    """One exposed step moves ONLY the rendered view's exposure row."""
    ts = _fresh_ts(scene)
    exp0 = np.asarray(ts.params["exposure"])
    opt = dataclasses.replace(OptimizationConfig(), **_EXPOSURE_ONLY)
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())
    v = 2
    ts, _ = T.train_step(
        ts, scene.cameras[v], jnp.asarray(scene.edge_maps[v]) * 0.5, bg,
        opt, pipe, use_mask=False, n_gaussians=12,
        view_idx=jnp.asarray(v, jnp.int32), use_exposure=True,
    )
    exp1 = np.asarray(ts.params["exposure"])
    assert np.any(exp1[v] != exp0[v]), "exposure grad for the view is zero"
    others = [i for i in range(exp0.shape[0]) if i != v]
    np.testing.assert_array_equal(exp1[others], exp0[others])


@pytest.mark.slow
def test_exposure_recovery(scene):
    """GT = a * render0 + b is fit by exposure -> (a, b) alone."""
    a, b = 0.8, 0.1
    ts = _fresh_ts(scene, n_views=1)
    opt = dataclasses.replace(OptimizationConfig(), **_EXPOSURE_ONLY)
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    bg = jnp.zeros(())
    cam = scene.cameras[0]
    render0 = T.eval_render(ts, cam, pipe, bg, use_mask=False, n_gaussians=12)[
        "render"
    ]
    assert float(jnp.max(render0)) > 0.2, "initial render is empty"
    gt = a * render0 + b  # in [0.1, 0.9]: no clipping anywhere

    K = 120
    w2c = jnp.broadcast_to(cam.world_to_cam, (K, 4, 4))
    proj = jnp.broadcast_to(cam.full_proj, (K, 4, 4))
    ctr = jnp.broadcast_to(cam.cam_center, (K, 3))
    gts = jnp.broadcast_to(gt, (K,) + gt.shape)
    vis = jnp.zeros((K,), jnp.int32)
    geom = (cam.height, cam.width, cam.tanfovx, cam.tanfovy)
    ts, metrics = T.train_steps_scan(
        ts, (w2c, proj, ctr), gts, bg, opt, pipe, use_mask=False,
        n_gaussians=12, cam_geom=geom, view_indices=vis, use_exposure=True,
    )
    exp = np.asarray(ts.params["exposure"])[0]
    assert abs(exp[0] - a) < 0.06 and abs(exp[1] - b) < 0.06, exp
    tot = np.asarray(metrics["total"])
    assert tot[-1] < 0.25 * tot[0], (tot[0], tot[-1])


def test_exposure_off_is_inert(scene):
    """Default path: exposure rows never move (grad identically zero)."""
    ts = _fresh_ts(scene)
    exp0 = np.asarray(ts.params["exposure"])
    opt = OptimizationConfig()
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    ts, _ = T.train_step(
        ts, scene.cameras[0], jnp.asarray(scene.edge_maps[0]), jnp.zeros(()),
        opt, pipe, use_mask=False, n_gaussians=12,
    )
    np.testing.assert_array_equal(np.asarray(ts.params["exposure"]), exp0)


def test_exposure_parallel_scan(scene):
    """use_exposure through the shard_map DP path (2-device CPU mesh)."""
    from curve_gaussian_tpu.parallel import sharding as sh
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    ts = _fresh_ts(scene)
    exp0 = np.asarray(ts.params["exposure"])
    opt = dataclasses.replace(OptimizationConfig(), **_EXPOSURE_ONLY)
    pipe = dataclasses.replace(PipelineConfig(), tile_capacity=256)
    mesh = sh.make_mesh(2)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(None, "data"))
    K, B = 2, 2
    vi = np.array([[0, 1], [2, 3]], np.int32)
    w2c = jax.device_put(
        jnp.stack([scene.cameras[i].world_to_cam for i in vi.ravel()]
                  ).reshape(K, B, 4, 4), shard)
    proj = jax.device_put(
        jnp.stack([scene.cameras[i].full_proj for i in vi.ravel()]
                  ).reshape(K, B, 4, 4), shard)
    ctr = jax.device_put(
        jnp.stack([scene.cameras[i].cam_center for i in vi.ravel()]
                  ).reshape(K, B, 3), shard)
    gts = jax.device_put(
        jnp.stack([jnp.asarray(scene.edge_maps[i]) * 0.5
                   for i in vi.ravel()]).reshape(
            K, B, *scene.edge_maps[0].shape), shard)
    cam0 = scene.cameras[0]
    geom = (cam0.height, cam0.width, cam0.tanfovx, cam0.tanfovy)
    ts = jax.device_put(ts, repl)
    ts, _ = sh.parallel_train_steps_scan(
        ts, (w2c, proj, ctr), gts, jnp.zeros(()), opt, pipe, use_mask=False,
        mesh_shape=(("data", 2),), cam_geom=geom,
        view_indices=jax.device_put(jnp.asarray(vi), shard),
        use_exposure=True,
    )
    exp1 = np.asarray(ts.params["exposure"])
    assert np.all(np.any(exp1 != exp0, axis=1)), (
        "every rendered view's exposure row should move"
    )

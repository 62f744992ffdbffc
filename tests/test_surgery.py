"""Topology surgery tests: extract/repack roundtrip, split, prune, trim,
merge, line conversion, and the full schedule."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.config import OptimizationConfig
from curve_gaussian_tpu.engine import train as T
from curve_gaussian_tpu.models import curve_state as cs
from curve_gaussian_tpu.models import fitting, surgery


def make_ts(rng, n=10, m=12):
    pts = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    state = cs.init_state(pts, n_views=2, n_gaussians=m, capacity=cs.MIN_CAPACITY)
    return T.init_train_state(state)


def test_extract_repack_roundtrip(rng):
    ts = make_ts(rng, n=7)
    host = surgery.extract(ts)
    assert host.n == 7
    ts2 = surgery.repack(host, ts)
    for k in surgery.PARAM_KEYS:
        np.testing.assert_allclose(
            np.asarray(ts2.params[k])[:7], np.asarray(ts.params[k])[:7]
        )
    assert int(jnp.sum(ts2.alive)) == 7


def test_split_preserves_geometry(rng):
    ts = make_ts(rng, n=5)
    host = surgery.extract(ts)
    sel = np.zeros(5, bool)
    sel[1] = True
    cp_orig = host.params["curve_points"][1].copy()
    host2 = surgery.split_curves(host, sel, np.asarray([0.4]))
    assert host2.n == 6  # one removed, two added
    # children endpoints join at B(0.4) of the parent
    t = np.asarray([0.4])
    mid = fitting.sample_bezier(cp_orig, t)[0]
    left = host2.params["curve_points"][-2]
    right = host2.params["curve_points"][-1]
    np.testing.assert_allclose(left[3], mid, atol=1e-5)
    np.testing.assert_allclose(right[0], mid, atol=1e-5)
    np.testing.assert_allclose(left[0], cp_orig[0], atol=1e-6)
    np.testing.assert_allclose(right[3], cp_orig[3], atol=1e-6)


def test_only_prune_removes_transparent(rng):
    ts = make_ts(rng, n=6)
    host = surgery.extract(ts)
    host.params["opacity_raw"][2] = cs.inverse_sigmoid_np(0.001)
    host2 = surgery.only_prune(host, min_opacity=0.01, mask_threshold=0.01)
    assert host2.n == 5


def test_mask_trim(rng):
    ts = make_ts(rng, n=4, m=12)
    host = surgery.extract(ts)
    # kill mask on the first 4 samples of curve 0 -> trim its start
    host.params["mask_raw"][0, :4] = -10.0
    cp_before = host.params["curve_points"][0].copy()
    host2 = surgery.mask_trim_split(host, mask_threshold=0.01)
    cp_after = host2.params["curve_points"][0]
    assert not np.allclose(cp_before, cp_after)
    # new start is inside the old curve (past the old start along the curve)
    t = np.linspace(0, 1, 200)
    pts = fitting.sample_bezier(cp_before, t)
    d = np.linalg.norm(pts - cp_after[0], axis=1).min()
    assert d < 2e-2
    # moments zeroed for the trimmed row
    assert np.all(host2.mu["curve_points"][0] == 0)


def test_fit_curve_to_line(rng):
    ts = make_ts(rng, n=3)
    host = surgery.extract(ts)
    # make curve 0 exactly straight
    p0 = np.array([0.2, 0.2, 0.2], np.float32)
    p3 = np.array([0.8, 0.6, 0.4], np.float32)
    host.params["curve_points"][0] = np.stack(
        [p0, p0 + (p3 - p0) / 3, p0 + 2 * (p3 - p0) / 3, p3]
    )
    # make curve 1 strongly bent
    host.params["curve_points"][1, 1] += 0.3
    host2 = surgery.fit_curve_to_line(host, threshold=0.002, threshold_max=0.005)
    assert not host2.is_bezier[0]
    assert host2.is_bezier[1]
    np.testing.assert_allclose(host2.params["curve_points"][0, 0], p0, atol=1e-3)


def test_merge_collinear_beziers(rng):
    ts = make_ts(rng, n=4)
    host = surgery.extract(ts)
    # two curves forming consecutive spans of one straight line
    a, b, c = (
        np.array([0.1, 0.5, 0.5]),
        np.array([0.4, 0.5, 0.5]),
        np.array([0.7, 0.5, 0.5]),
    )

    def straight(p, q):
        return np.stack([p, p + (q - p) / 3, p + 2 * (q - p) / 3, q]).astype(
            np.float32
        )

    host.params["curve_points"][0] = straight(a, b)
    host.params["curve_points"][1] = straight(b + 0.005, c)
    # move the others far away
    host.params["curve_points"][2] += 5.0
    host.params["curve_points"][3] -= 5.0
    n_before = host.n
    host2 = surgery.merge_curves(host, distance_threshold=0.02,
                                 similarity_threshold=0.97)
    assert host2.n == n_before - 1  # 2 merged into 1
    merged_cp = host2.params["curve_points"][-1]
    span = np.linalg.norm(merged_cp[3] - merged_cp[0])
    assert span > 0.5  # covers a..c

def test_merge_lines(rng):
    ts = make_ts(rng, n=4)
    host = surgery.extract(ts)
    a, b, c = (
        np.array([0.1, 0.5, 0.5]),
        np.array([0.4, 0.5, 0.5]),
        np.array([0.7, 0.5, 0.5]),
    )
    z = np.zeros(3)
    host.params["curve_points"][0] = np.stack([a, z, z, b]).astype(np.float32)
    host.params["curve_points"][1] = np.stack([b + 0.004, z, z, c]).astype(np.float32)
    host.is_bezier[:2] = False
    host.params["curve_points"][2] += 5.0
    host.params["curve_points"][3] -= 5.0
    host2 = surgery.merge_curves(host)
    assert host2.n == 3
    assert not host2.is_bezier[-1]
    cp = host2.params["curve_points"][-1]
    assert np.linalg.norm(cp[3] - cp[0]) > 0.55


def test_schedule_noop_and_fix_opacity(rng):
    ts = make_ts(rng, n=6)
    opt = OptimizationConfig()
    ts1 = surgery.apply_schedule(ts, 17, opt)
    assert ts1 is ts  # nothing scheduled at iter 17
    ts2 = surgery.apply_schedule(ts, opt.densify_until_iter, opt)
    assert bool(ts2.opacity_frozen)
    opa = 1 / (1 + np.exp(-np.asarray(ts2.params["opacity_raw"])[:6]))
    assert (opa >= 0.6 - 1e-5).all()


def test_capacity_rebucket_grows(rng):
    ts = make_ts(rng, n=10)
    host = surgery.extract(ts)
    # split everything several times to exceed MIN_CAPACITY
    for _ in range(5):
        host = surgery.split_curves(
            host, np.ones(host.n, bool), np.full(host.n, 0.5)
        )
    assert host.n == 320
    ts2 = surgery.repack(host, ts)
    assert ts2.alive.shape[0] == 512
    assert int(jnp.sum(ts2.alive)) == 320

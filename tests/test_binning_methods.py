"""Sort-based vs pairs-based binning: the two constructions are
independent implementations of the same spec and must agree exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops.camera import look_at_camera
from curve_gaussian_tpu.ops.projection import preprocess


def _pre(rng, n=400, big_fraction=0.0, cam=None):
    cam = cam or look_at_camera(
        eye=[0.0, 0.3, -2.0], target=[0.0, 0.0, 0.0], height=64, width=256
    )
    xyz = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    scale = np.full((n, 3), 0.01, np.float32)
    scale[:, 0] = rng.uniform(0.005, 0.05, size=n)
    if big_fraction:
        nb = int(n * big_fraction)
        scale[:nb] = rng.uniform(0.1, 0.4, size=(nb, 3))  # huge fuzzy splats
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    opacity = rng.uniform(0.3, 0.9, size=n).astype(np.float32)
    return (
        preprocess(
            jnp.asarray(xyz), jnp.asarray(scale), jnp.asarray(quat),
            jnp.asarray(opacity), cam,
        ),
        cam,
    )


def _tables(b: B.Binning):
    idx = np.asarray(b.gather_idx).copy()
    idx[~np.asarray(b.slot_valid)] = -1
    return idx


@pytest.mark.parametrize("big_fraction", [0.0, 0.15])
def test_methods_agree_exactly(rng, big_fraction):
    pre, cam = _pre(rng, big_fraction=big_fraction)
    kw = dict(height=cam.height, width=cam.width, capacity=512)
    bs = B.bin_gaussians(pre, method="sort", **kw)
    bp = B.bin_gaussians(pre, method="pairs", **kw)
    np.testing.assert_array_equal(np.asarray(bs.counts), np.asarray(bp.counts))
    np.testing.assert_array_equal(_tables(bs), _tables(bp))
    assert int(bs.overflow) == 0 and int(bp.overflow) == 0
    # peak = max per-tile candidate count pre-clamp, identical across
    # constructions and consistent with the counts (no overflow here)
    assert int(bs.peak) == int(bp.peak) == int(np.asarray(bs.counts).max())


def test_big_tier_covers_large_rects(rng):
    """Splats spanning more than tier1_rect tiles keep full coverage via
    the big tier (same tables as the exhaustive pairs method)."""
    pre, cam = _pre(rng, n=64, big_fraction=0.5)
    kw = dict(height=cam.height, width=cam.width, capacity=512)
    bs = B.bin_gaussians(pre, method="sort", tier1_rect=2, **kw)
    bp = B.bin_gaussians(pre, method="pairs", **kw)
    np.testing.assert_array_equal(_tables(bs), _tables(bp))


def test_big_tier_budget_overflow_reported(rng):
    """More big-rect splats than big_capacity => coverage drop REPORTED."""
    pre, cam = _pre(rng, n=256, big_fraction=1.0)
    bs = B.bin_gaussians(
        pre, height=cam.height, width=cam.width, capacity=512,
        tier1_rect=1, big_capacity=8,
    )
    assert int(bs.overflow) > 0


def test_depth_order_within_tiles(rng):
    pre, cam = _pre(rng)
    b = B.bin_gaussians(pre, height=cam.height, width=cam.width, capacity=512)
    depth = np.asarray(pre.depth)
    idx = np.asarray(b.gather_idx)
    valid = np.asarray(b.slot_valid)
    for t in range(idx.shape[0]):
        d = depth[idx[t][valid[t]]]
        assert np.all(np.diff(d) >= 0)


@pytest.mark.parametrize("big_fraction", [0.0, 0.15])
def test_packed_sort_matches_unpacked(rng, big_fraction):
    """SORT_PACKED (single packed uint32 key + index key) keeps the
    binning SEMANTICS: identical per-tile membership and counts, and
    depth-sorted slots up to the ~2^-14 relative key quantization.  Slot
    ORDER can legally differ from the 3-operand sort where two depths
    fall inside one quantization step (the tie falls to the index key) —
    that is exactly why the flag defaults off pending a parity-tier
    exemption."""
    pre, cam = _pre(rng, big_fraction=big_fraction)
    nty, ntx = B.tile_grid(cam.height, cam.width)
    args = (pre, nty, ntx, 512, 16, 4, 1024)
    base = B._bin_sort(*args)
    old = B.SORT_PACKED
    B.SORT_PACKED = True
    try:
        packed = B._bin_sort(*args)
    finally:
        B.SORT_PACKED = old
    np.testing.assert_array_equal(
        np.asarray(base.counts), np.asarray(packed.counts)
    )
    assert int(packed.overflow) == int(base.overflow)
    bi, pi = _tables(base), _tables(packed)
    depth = np.asarray(pre.depth)
    for t in range(bi.shape[0]):
        a, b = bi[t][bi[t] >= 0], pi[t][pi[t] >= 0]
        # same membership per tile
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
        if len(b) > 1:  # depth-ordered up to key quantization
            # the packed key keeps (23 - tbits) depth mantissa bits, so
            # adjacent representable depths differ by <= 2^-(23-tbits)
            # relative; derive the bound from the actual tile count so a
            # fixture change cannot silently invalidate it (ADVICE r4)
            tbits = (bi.shape[0] + 1).bit_length()
            d = depth[b]
            assert np.all(np.diff(d) >= -np.abs(d[:-1]) * 2.0 ** -(23 - tbits - 1))


@pytest.fixture(autouse=True)
def _pin_exact_depth_sort(exact_depth_sort):
    """This module compares against full-precision depth-order oracles;
    see the exact_depth_sort fixture (conftest) for why SORT_PACKED is
    exempted from bit-parity tiers."""


@pytest.mark.parametrize("big_fraction", [0.15, 1.0])
def test_big_compact_sort_matches_scatter(rng, big_fraction):
    """BIG_COMPACT_SORT (stable-sort compaction, round 5) must reproduce
    the scatter compaction BIT-EXACTLY: the stable sort keeps big-tier
    members in original-index order, which is exactly the cumsum-rank
    order the scatter used."""
    pre, cam = _pre(rng, big_fraction=big_fraction)
    nty, ntx = B.tile_grid(cam.height, cam.width)
    a = B._bin_sort(pre, nty, ntx, 512, 16, 2, 16, big_sort=True)
    b = B._bin_sort(pre, nty, ntx, 512, 16, 2, 16, big_sort=False)
    for fa, fb, name in zip(a, b, a._fields):
        if fa is None:
            assert fb is None
            continue
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb), err_msg=name
        )

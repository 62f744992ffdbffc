"""Native C++ runtime vs scipy/numpy oracles."""
import numpy as np
import pytest

from curve_gaussian_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_nn1_matches_scipy(lib, rng):
    from scipy.spatial import cKDTree

    base = rng.uniform(size=(2000, 3)).astype(np.float32)
    query = rng.uniform(size=(500, 3)).astype(np.float32)
    d, i = native.nn1(base, query)
    d2, i2 = cKDTree(base).query(query, k=1)
    np.testing.assert_allclose(d, d2, rtol=1e-5)
    np.testing.assert_array_equal(i, i2)


def test_knn_mean_sq(lib, rng):
    from scipy.spatial import cKDTree

    pts = rng.uniform(size=(300, 3)).astype(np.float32)
    out = native.knn_mean_sq(pts, k=3)
    d, _ = cKDTree(pts).query(pts, k=4)
    expect = (d[:, 1:] ** 2).mean(axis=1)
    np.testing.assert_allclose(out, expect, rtol=1e-4)


def test_connected_components(lib):
    adj = np.zeros((6, 6), bool)
    adj[0, 1] = adj[1, 2] = True
    adj[4, 5] = True
    n, labels = native.connected_components(adj)
    assert n == 3
    assert labels[0] == labels[1] == labels[2]
    assert labels[4] == labels[5]
    assert labels[3] not in (labels[0], labels[4])


def test_proximity_components(lib):
    pts = np.array(
        [[0, 0, 0], [0.01, 0, 0], [1, 1, 1], [1.005, 1, 1], [5, 5, 5]],
        np.float32,
    )
    n, labels = native.proximity_components(pts, 0.02)
    assert n == 3
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]


def test_voxel_downsample(lib, rng):
    from curve_gaussian_tpu.eval.metrics import downsample_voxel_average

    pts = rng.uniform(size=(5000, 3)).astype(np.float32)
    a = native.voxel_downsample_average(pts, 32, (0, 0, 0), (1, 1, 1))
    b = downsample_voxel_average(pts, 32, (0, 0, 0), (1, 1, 1))
    assert len(a) == len(b)
    # same voxel means, order may differ -> compare sorted
    np.testing.assert_allclose(
        np.sort(a.round(5), axis=0), np.sort(b.round(5), axis=0), atol=1e-4
    )

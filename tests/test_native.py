"""Native C++ geometry runtime vs scipy/numpy oracles."""
import numpy as np
import pytest
from scipy.spatial import cKDTree

from spann3r_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def test_kdtree_nn_matches_scipy(rng):
    ref = rng.random((3000, 3)).astype(np.float32)
    q = rng.random((500, 3)).astype(np.float32)
    nd, ni = native.NativeKDTree(ref).query(q)
    sd, si = cKDTree(ref).query(q)
    np.testing.assert_allclose(nd, sd, rtol=1e-5, atol=1e-6)
    # ties possible but distances identical guarantee correctness
    same = ni == si
    assert same.mean() > 0.99


def test_kdtree_knn_matches_scipy(rng):
    ref = rng.random((1000, 3)).astype(np.float32)
    q = rng.random((100, 3)).astype(np.float32)
    _, ni = native.NativeKDTree(ref).query(q, k=8)
    _, si = cKDTree(ref).query(q, k=8)
    # compare as sets per query (tie order may differ)
    for a, b in zip(ni, si):
        assert set(a) == set(b)


def test_native_icp_recovers_transform(rng):
    pts = rng.random((3000, 3)).astype(np.float64)
    ang = np.deg2rad(4)
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.03, -0.02, 0.04])
    src = pts @ r.T + t
    trans = native.icp_p2p(src, pts, threshold=0.5)
    aligned = src @ trans[:3, :3].T + trans[:3, 3]
    assert np.abs(aligned - pts).max() < 2e-3


def test_native_normals_plane(rng):
    pts = np.zeros((400, 3), np.float32)
    pts[:, :2] = rng.random((400, 2))
    n = native.estimate_normals(pts, k=12)
    assert np.abs(np.abs(n[:, 2]) - 1).max() < 1e-5


def test_chamfer_stats_match_scipy(rng):
    a = rng.random((2000, 3)).astype(np.float32)
    b = rng.random((1500, 3)).astype(np.float32)
    mean, med = native.chamfer_stats(a, b)
    d, _ = cKDTree(a).query(b)
    np.testing.assert_allclose(mean, d.mean(), rtol=1e-5)
    np.testing.assert_allclose(med, np.median(d), rtol=1e-5)

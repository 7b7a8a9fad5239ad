"""Numpy geometry + device helpers parity vs the reference."""
import numpy as np
import pytest

from spann3r_tpu.utils.device import collate_with_cat, to_numpy, todevice
from spann3r_tpu.utils.geometry import (colmap_to_opencv_intrinsics,
                                        depthmap_to_absolute_camera_coordinates,
                                        depthmap_to_camera_coordinates,
                                        opencv_to_colmap_intrinsics)

from .conftest import requires_reference


@requires_reference
def test_unprojection_parity(rng):
    from dust3r.utils.geometry import (
        depthmap_to_absolute_camera_coordinates as ref_abs)

    depth = (rng.random((24, 32)) * 3).astype(np.float32)
    depth[rng.random((24, 32)) < 0.2] = 0
    k = np.array([[30.0, 0, 16], [0, 28.0, 12], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.5, -0.2, 1.0]

    pts, valid = depthmap_to_absolute_camera_coordinates(depth, k, pose)
    ref_pts, ref_valid = ref_abs(depthmap=depth, camera_intrinsics=k,
                                 camera_pose=pose)
    np.testing.assert_allclose(pts, ref_pts, rtol=1e-6)
    np.testing.assert_array_equal(valid, ref_valid)


def test_unprojection_pinhole_identity(rng):
    depth = np.full((8, 10), 2.0, np.float32)
    k = np.array([[5.0, 0, 5], [0, 5.0, 4], [0, 0, 1]], np.float32)
    cam, valid = depthmap_to_camera_coordinates(depth, k)
    assert valid.all()
    np.testing.assert_allclose(cam[4, 5], [0, 0, 2.0])  # principal point ray
    np.testing.assert_allclose(cam[4, 6], [0.4, 0, 2.0])  # 1px right: z/f = 0.4


def test_intrinsics_convention_roundtrip():
    k = np.array([[100.0, 0, 64], [0, 90.0, 48], [0, 0, 1]])
    k2 = colmap_to_opencv_intrinsics(opencv_to_colmap_intrinsics(k))
    np.testing.assert_allclose(k2, k)
    assert opencv_to_colmap_intrinsics(k)[0, 2] == 64.5


def test_device_helpers_roundtrip(rng):
    tree = {"a": rng.random((3, 4)).astype(np.float32),
            "b": [rng.random(2).astype(np.float32), "label"]}
    dev = todevice(tree)
    back = to_numpy(dev)
    np.testing.assert_allclose(back["a"], tree["a"])
    assert back["b"][1] == "label"

    items = [{"x": np.ones((2, 3)), "idx": [0, 1]},
             {"x": np.zeros((1, 3)), "idx": [2]}]
    cat = collate_with_cat(items)
    assert cat["x"].shape == (3, 3)
    assert cat["idx"] == [0, 1, 2]


def test_find_reciprocal_matches(rng):
    from spann3r_tpu.utils.geometry import find_reciprocal_matches

    p1 = rng.random((200, 3)).astype(np.float32)
    # p2 = a shuffled noisy subset of p1 plus far-away outliers
    perm = rng.permutation(150)
    p2 = np.concatenate([p1[perm] + 1e-4 * rng.standard_normal((150, 3)).astype(np.float32),
                         10.0 + rng.random((50, 3)).astype(np.float32)]).astype(np.float32)

    rec_in_p2, nn2_in_p1, n = find_reciprocal_matches(p1, p2)
    assert rec_in_p2.shape == (len(p2),) and nn2_in_p1.shape == (len(p2),)
    assert n == int(rec_in_p2.sum())

    # oracle: brute-force mutual NN (ref dust3r/utils/geometry.py:340-356)
    d = np.linalg.norm(p1[:, None] - p2[None], axis=-1)
    nn1 = d.argmin(axis=1)   # p1 -> p2
    nn2 = d.argmin(axis=0)   # p2 -> p1
    np.testing.assert_array_equal(nn2_in_p1, nn2)
    np.testing.assert_array_equal(rec_in_p2, nn1[nn2] == np.arange(len(p2)))
    # every noisy-subset point is a mutual match, no outlier is
    assert rec_in_p2[:150].all() and not rec_in_p2[150:].any()
    # reciprocity is symmetric: |matches in p1| == |matches in p2|
    assert (nn2[nn1] == np.arange(len(p1))).sum() == n

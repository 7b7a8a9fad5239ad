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

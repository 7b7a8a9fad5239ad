"""Numpy z-buffer depth rasterizer sanity checks."""
import numpy as np

from spann3r_tpu.tools.render_dtu import render_depth_map, render_depth_maps


def _frontal_quad(z=2.0, half=1.0):
    verts = np.array([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    return verts, faces


def test_frontal_plane_depth():
    h = w = 32
    f = 16.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    verts, faces = _frontal_quad(z=2.0)
    # camera at origin looking down +z in CV terms == GL pose with z flip
    pose = np.eye(4)
    depth = render_depth_map(verts, faces, pose, k, h, w, far=10.0,
                             opengl_pose=False)
    center = depth[h // 2, w // 2]
    assert abs(center - 2.0) < 1e-3
    # the quad spans |x|<=1 at z=2 -> u within f*1/2 = 8 px of center
    assert depth[h // 2, 2] == 0.0  # outside the quad


def test_zbuffer_occlusion():
    h = w = 16
    f = 8.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    v1, f1 = _frontal_quad(z=2.0, half=2.0)
    v2, f2 = _frontal_quad(z=1.0, half=2.0)  # closer quad occludes
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    depth = render_depth_map(verts, faces, np.eye(4), k, h, w, far=10.0,
                             opengl_pose=False)
    assert abs(depth[h // 2, w // 2] - 1.0) < 1e-3


def test_batch_api():
    h = w = 8
    k = np.array([[4.0, 0, 4], [0, 4.0, 4], [0, 0, 1]])
    verts, faces = _frontal_quad(z=-2.0)  # GL: camera looks down -z
    maps = render_depth_maps(verts, faces, [np.eye(4)] * 3, k, h, w, far=10.0)
    assert len(maps) == 3 and maps[0].shape == (h, w)
    assert abs(maps[0][4, 4] - 2.0) < 1e-3

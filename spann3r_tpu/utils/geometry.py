"""Geometry utilities (JAX + numpy variants).

JAX versions serve the jitted loss/eval paths; numpy versions serve the
host-side dataset pipeline.  Independent reimplementation of the contracts in
reference dust3r/utils/geometry.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# JAX (device) versions
# ---------------------------------------------------------------------------

def inv_se3(mat: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) rigid/affine transforms via linalg.inv."""
    return jnp.linalg.inv(mat)


def geotrf(trf: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (B, 4, 4) (or (B, 3, 3)) transforms to (B, ..., 3) points
    (ref dust3r/utils/geometry.py:40-101, batched fast path)."""
    d = pts.shape[-1]
    batch = trf.shape[0]
    flat = pts.reshape(batch, -1, d)
    if trf.shape[-1] == d:
        out = jnp.einsum("bij,bnj->bni", trf, flat)
    else:
        out = jnp.einsum("bij,bnj->bni", trf[:, :d, :d], flat) + trf[:, None, :d, d]
    return out.reshape(pts.shape)


def xy_grid(w: int, h: int) -> jax.Array:
    """(H, W, 2) int32 grid with out[j, i] = (i, j)."""
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    return jnp.stack([xs, ys], axis=-1)


def estimate_focal_weiszfeld(pts3d: jax.Array, pp: jax.Array,
                             iters: int = 10,
                             min_focal: float = 0.0,
                             max_focal: float = np.inf) -> jax.Array:
    """Robust focal from a pointmap (ref dust3r/post_process.py:36-60).

    pts3d: (B, H, W, 3); pp: (B, 2) principal point.  IRLS on pixel-ray votes,
    clipped around the 60-deg-FoV base focal.
    """
    b, h, w, _ = pts3d.shape
    pixels = xy_grid(w, h).reshape(1, -1, 2).astype(jnp.float32) - pp[:, None, :]
    pts = pts3d.reshape(b, -1, 3)

    z = pts[..., 2:3]
    xy_over_z = jnp.where(jnp.abs(z) > 0, pts[..., :2] / z, 0.0)
    xy_over_z = jnp.nan_to_num(xy_over_z, posinf=0.0, neginf=0.0)

    dot_xy_px = jnp.sum(xy_over_z * pixels, axis=-1)
    dot_xy_xy = jnp.sum(jnp.square(xy_over_z), axis=-1)
    focal = jnp.mean(dot_xy_px, axis=1) / jnp.clip(jnp.mean(dot_xy_xy, axis=1), 1e-12)

    def body(_, focal):
        dis = jnp.linalg.norm(pixels - focal[:, None, None] * xy_over_z, axis=-1)
        w_ = 1.0 / jnp.clip(dis, 1e-8)
        return (jnp.mean(w_ * dot_xy_px, axis=1)
                / jnp.clip(jnp.mean(w_ * dot_xy_xy, axis=1), 1e-12))

    focal = jax.lax.fori_loop(0, iters, body, focal)
    focal_base = max(h, w) / (2 * np.tan(np.deg2rad(60) / 2))
    return jnp.clip(focal, min_focal * focal_base, max_focal * focal_base)


# ---------------------------------------------------------------------------
# numpy (host / dataset) versions
# ---------------------------------------------------------------------------

def depthmap_to_camera_coordinates(depthmap: np.ndarray, intrinsics: np.ndarray
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Pinhole unprojection (ref geometry.py:165-197). Returns (X_cam, valid)."""
    intrinsics = np.float32(intrinsics)
    h, w = depthmap.shape
    assert intrinsics[0, 1] == 0.0 and intrinsics[1, 0] == 0.0
    fu, fv = intrinsics[0, 0], intrinsics[1, 1]
    cu, cv = intrinsics[0, 2], intrinsics[1, 2]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    z = depthmap
    x = (u - cu) * z / fu
    y = (v - cv) * z / fv
    x_cam = np.stack((x, y, z), axis=-1).astype(np.float32)
    return x_cam, depthmap > 0.0


def depthmap_to_absolute_camera_coordinates(depthmap: np.ndarray,
                                            intrinsics: np.ndarray,
                                            camera_pose: np.ndarray
                                            ) -> Tuple[np.ndarray, np.ndarray]:
    """World-frame pointmap from depth + intrinsics + cam2world pose."""
    x_cam, valid = depthmap_to_camera_coordinates(depthmap, intrinsics)
    r, t = camera_pose[:3, :3], camera_pose[:3, 3]
    x_world = np.einsum("ik,vuk->vui", r, x_cam) + t[None, None, :]
    return x_world.astype(np.float32), valid


def colmap_to_opencv_intrinsics(k: np.ndarray) -> np.ndarray:
    k = k.copy()
    k[0, 2] -= 0.5
    k[1, 2] -= 0.5
    return k


def opencv_to_colmap_intrinsics(k: np.ndarray) -> np.ndarray:
    k = k.copy()
    k[0, 2] += 0.5
    k[1, 2] += 0.5
    return k


def np_xy_grid(w: int, h: int) -> np.ndarray:
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([xs, ys], axis=-1)


def find_reciprocal_matches(p1: np.ndarray, p2: np.ndarray):
    """Mutual nearest-neighbour matches between two point sets
    (ref dust3r/utils/geometry.py:340-356).

    Returns (reciprocal_in_p2 bool (len(p2),), nn2_in_p1 int (len(p2),),
    num_matches) — p2[i] matches p1[nn2_in_p1[i]] iff reciprocal_in_p2[i].
    Host-side; uses the native C++ KD-tree (spann3r_tpu/native) when built,
    scipy otherwise.
    """
    from .. import native

    p1 = np.ascontiguousarray(p1, np.float32)
    p2 = np.ascontiguousarray(p2, np.float32)
    if native.available() and p1.shape[1] == 3:
        tree1, tree2 = native.NativeKDTree(p1), native.NativeKDTree(p2)
        _, nn1_in_p2 = tree2.query(p1)
        _, nn2_in_p1 = tree1.query(p2)
    else:
        from scipy.spatial import cKDTree

        _, nn1_in_p2 = cKDTree(p2).query(p1, workers=-1)
        _, nn2_in_p1 = cKDTree(p1).query(p2, workers=-1)

    reciprocal_in_p2 = nn1_in_p2[nn2_in_p1] == np.arange(len(p2))
    return reciprocal_in_p2, nn2_in_p1, int(reciprocal_in_p2.sum())

"""Tools: ICP, normals, metrics, PLY/GLB export, PnP, focal estimation."""
import json
import os

import numpy as np
import pytest

from spann3r_tpu.tools.eval_recon import (accuracy, completion,
                                          completion_ratio, compute_iou)
from spann3r_tpu.tools.icp import (estimate_normals, registration_icp)
from spann3r_tpu.utils.export import (read_ply, transforms_json,
                                      write_glb_pointcloud, write_ply)


def _rot(deg):
    a = np.deg2rad(deg)
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]])


def test_icp_recovers_small_transform(rng):
    pts = rng.random((2000, 3)).astype(np.float64)
    r = _rot(4.0)
    t = np.array([0.03, -0.02, 0.05])
    src = pts @ r.T + t
    trans = registration_icp(src, pts, threshold=0.5)
    aligned = src @ trans[:3, :3].T + trans[:3, 3]
    assert np.abs(aligned - pts).max() < 1e-3


def test_normals_on_plane(rng):
    pts = np.zeros((500, 3))
    pts[:, :2] = rng.random((500, 2))
    n = estimate_normals(pts, k=10)
    assert np.abs(np.abs(n[:, 2]) - 1.0).max() < 1e-6


def test_metrics_identity(rng):
    pts = rng.random((1000, 3))
    acc, acc_med = accuracy(pts, pts)
    comp, comp_med = completion(pts, pts)
    assert acc == 0 and comp == 0
    assert completion_ratio(pts, pts) == 1.0
    assert compute_iou(pts, pts) == 1.0
    acc2, _ = accuracy(pts, pts + 0.5)
    assert acc2 > 0


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.random((100, 3)).astype(np.float32)
    cols = rng.random((100, 3)).astype(np.float32)
    path = str(tmp_path / "x.ply")
    write_ply(path, pts, cols)
    pts2, cols2 = read_ply(path)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    assert cols2.dtype == np.uint8 and cols2.shape == (100, 3)


def test_glb_is_valid(tmp_path, rng):
    pts = rng.random((50, 3)).astype(np.float32)
    cols = rng.random((50, 3)).astype(np.float32)
    path = str(tmp_path / "x.glb")
    write_glb_pointcloud(path, pts, cols)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"glTF"
    import struct
    _, version, total = struct.unpack("<III", data[:12])
    assert version == 2 and total == len(data)
    json_len = struct.unpack("<I", data[12:16])[0]
    gltf = json.loads(data[20:20 + json_len])
    assert gltf["meshes"][0]["primitives"][0]["mode"] == 0  # POINTS


def test_transforms_json_gl_convention():
    pose = np.eye(4)
    d = transforms_json(224, 224, 120.0, [pose], "x.ply")
    m = np.array(d["frames"][0]["transform_matrix"])
    assert m[1, 1] == -1 and m[2, 2] == -1  # CV -> GL flip
    assert d["fl_x"] == 120.0


def test_pnp_recovers_pose(rng):
    """Synthetic pinhole scene: pose_from_pointmap inverts the camera."""
    from spann3r_tpu.utils.pnp import pose_from_pointmap

    h = w = 64
    f = 80.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    # ground-truth cam2world
    gt = np.eye(4)
    gt[:3, :3] = _rot(10.0)
    gt[:3, 3] = [0.2, -0.1, 0.3]
    # depth image -> cam coords -> world pts (the "pointmap" in world frame)
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    z = 2.0 + 0.5 * rng.random((h, w))
    x = (u - w / 2) * z / f
    y = (v - h / 2) * z / f
    cam_pts = np.stack([x, y, z], axis=-1)
    world = cam_pts @ gt[:3, :3].T + gt[:3, 3]
    pose = pose_from_pointmap(world.astype(np.float32), k)
    np.testing.assert_allclose(pose, gt, atol=1e-3)


def test_focal_weiszfeld(rng):
    import jax.numpy as jnp
    from spann3r_tpu.utils.geometry import estimate_focal_weiszfeld

    h = w = 64
    f = 75.0
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    z = 1.5 + rng.random((h, w))
    x = (u - w / 2) * z / f
    y = (v - h / 2) * z / f
    pts = np.stack([x, y, z], axis=-1)[None].astype(np.float32)
    pp = jnp.asarray([[w / 2.0, h / 2.0]])
    est = float(estimate_focal_weiszfeld(jnp.asarray(pts), pp)[0])
    assert abs(est - f) / f < 0.02


def test_trace_summary_cli(tmp_path, capsys):
    """tools/trace_summary.py parses a raw Chrome-trace export and reports
    per-op totals + a program timeline with inter-execution gaps (the
    pipelining-evidence protocol, PERF.md r4)."""
    import gzip
    import json
    import os.path as osp
    import sys

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "host threads"}},
        # two program executions, 10ms each, 2ms gap, on the device pid
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0, "dur": 10_000,
         "name": "jit_train_step(123)"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 12_000, "dur": 10_000,
         "name": "jit_train_step(123)"},
        {"ph": "X", "pid": 1, "tid": 2, "ts": 0, "dur": 4_000,
         "name": "fusion.1"},
        # host event must be excluded
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0, "dur": 99_000,
         "name": "host_thing"},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    sys.path.insert(0, osp.join(repo, "tools"))
    try:
        import trace_summary
    finally:
        sys.path.pop(0)
    old = sys.argv
    sys.argv = ["trace_summary", str(tmp_path), "--top", "5",
                "--program", "jit_train_step"]
    try:
        trace_summary.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "jit_train_step" in out and "fusion.1" in out
    assert "host_thing" not in out
    assert "gap_before=    2.00" in out
    assert "dur median 10.00 ms" in out

"""Global alignment on a synthetic consistent scene: the optimizer must
recover geometry agreeing with ground truth up to a global similarity."""
import numpy as np
import pytest

from spann3r_tpu.models.global_align import global_aligner
from spann3r_tpu.models.pairs import make_pairs

H = W = 16
F = 20.0  # focal
N = 3


def _make_scene(rng):
    """N cameras looking at a smooth depth surface; build exact pairwise
    predictions (pred_i: frame i in cam i; pred_j: frame j in cam i)."""
    # global surface: height field sampled per camera for simplicity —
    # use one shared cloud defined in world coords, visible in all views
    def cam_pose(i):
        pose = np.eye(4)
        ang = 0.15 * i
        pose[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                                 [-np.sin(ang), 0, np.cos(ang)]])
        pose[:3, 3] = [0.3 * i, 0.05 * i, -0.1 * i]
        return pose

    poses = [cam_pose(i) for i in range(N)]
    # per-camera depth -> world points
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    world = []
    for i in range(N):
        depth = 2.0 + 0.3 * np.sin(u / 4 + i) * np.cos(v / 4)
        x = (u - W / 2) * depth / F
        y = (v - H / 2) * depth / F
        cam_pts = np.stack([x, y, depth], -1)
        world.append(cam_pts @ poses[i][:3, :3].T + poses[i][:3, 3])

    pairs_idx = make_pairs(N, "complete", symmetrize=True)
    pred1, pred2, conf = [], [], []
    for a, b in pairs_idx:
        inv_a = np.linalg.inv(poses[a])
        pred1.append(world[a] @ inv_a[:3, :3].T + inv_a[:3, 3])
        pred2.append(world[b] @ inv_a[:3, :3].T + inv_a[:3, 3])
        conf.append(np.full((H, W), 3.0, np.float32))
    return {
        "view1": {"idx": [a for a, _ in pairs_idx]},
        "view2": {"idx": [b for _, b in pairs_idx]},
        "pred1": {"pts3d": np.stack(pred1).astype(np.float32),
                  "conf": np.stack(conf)},
        "pred2": {"pts3d_in_other_view": np.stack(pred2).astype(np.float32),
                  "conf": np.stack(conf)},
    }, world


def test_global_alignment_converges(rng):
    output, world = _make_scene(rng)
    aligner = global_aligner(output)
    l0 = float(aligner._loss(aligner.params, aligner._data()))
    loss = aligner.optimize(niter=400, lr=0.02)
    assert loss < l0 * 0.1, f"alignment failed to converge: {l0} -> {loss}"

    pts = aligner.get_pts3d()
    gt = np.stack(world)
    # compare INTERNAL consistency up to a global similarity: pairwise
    # distances between corresponding pixels across views
    a = pts.reshape(N, -1, 3)
    g = gt.reshape(N, -1, 3)
    sel = rng.integers(0, H * W, 64)
    da = np.linalg.norm(a[0][sel] - a[N - 1][sel], axis=-1)
    dg = np.linalg.norm(g[0][sel] - g[N - 1][sel], axis=-1)
    # scale-normalize both
    da = da / np.clip(np.median(np.abs(da)), 1e-9, None)
    dg = dg / np.clip(np.median(np.abs(dg)), 1e-9, None)
    corr = np.corrcoef(da, dg)[0, 1]
    assert corr > 0.8, f"geometry poorly recovered (corr {corr})"


def test_aligner_outputs_shapes(rng):
    output, _ = _make_scene(rng)
    aligner = global_aligner(output)
    aligner.optimize(niter=5)
    assert aligner.get_pts3d().shape == (N, H, W, 3)
    assert aligner.get_im_poses().shape == (N, 4, 4)
    assert aligner.get_focals().shape == (N,)
    assert aligner.get_depthmaps().shape == (N, H, W)
    assert aligner.get_masks().dtype == bool
    np.testing.assert_allclose(aligner.get_im_poses()[0], np.eye(4), atol=1e-6)


def test_mask_sky_keeps_energy_finite(rng):
    """Regression: mask_sky must zero the per-image MASK confidence, not the
    edge weights conf_i/conf_j that feed the energy through log (ref
    base_opt.py:320-326 zeroes im_conf only)."""
    output, _ = _make_scene(rng)
    aligner = global_aligner(output)
    h, w = aligner.h, aligner.w
    imgs = [np.zeros((h, w, 3), np.float32) for _ in range(aligner.n_imgs)]
    imgs[0][: h // 2] = [0.4, 0.6, 1.0]  # sky-blue top half
    masked = aligner.mask_sky(imgs)
    # optimization weights untouched -> energy stays finite
    for a, b in zip(masked.conf_i, aligner.conf_i):
        np.testing.assert_array_equal(a, b)
    loss0 = masked.optimize(niter=2, lr=0.01)
    assert np.isfinite(float(loss0))

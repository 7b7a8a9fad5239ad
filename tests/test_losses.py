"""Loss parity vs reference spann3r/loss.py on random sequences."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from spann3r_tpu import losses as L

from .conftest import requires_reference

T, B, H, W = 4, 2, 8, 12


def _random_pose(rng):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    pose[:3, 3] = rng.standard_normal(3)
    return pose


def _make_data(rng):
    gts = {
        "pts3d": rng.standard_normal((T, B, H, W, 3)).astype(np.float32) + 2.0,
        "valid_mask": rng.random((T, B, H, W)) > 0.3,
        "camera_pose": np.stack([np.stack([_random_pose(rng) for _ in range(B)])
                                 for _ in range(T)]),
    }
    preds = {
        "pts3d_1": rng.standard_normal((T - 1, B, H, W, 3)).astype(np.float32) + 2.0,
        "pts3d_2": rng.standard_normal((T - 1, B, H, W, 3)).astype(np.float32) + 2.0,
        "conf_1": 1.0 + np.exp(rng.standard_normal((T - 1, B, H, W)).astype(np.float32)),
        "conf_2": 1.0 + np.exp(rng.standard_normal((T - 1, B, H, W)).astype(np.float32)),
    }
    return gts, preds


def _to_ref(gts, preds):
    return _to_ref_b(gts, preds)


def _to_ref_b(gts, preds):
    import torch

    ref_gts = [{"pts3d": torch.from_numpy(gts["pts3d"][i]),
                "valid_mask": torch.from_numpy(gts["valid_mask"][i]),
                "camera_pose": torch.from_numpy(gts["camera_pose"][i])}
               for i in range(T)]
    ref_preds = []
    for i in range(T - 1):
        k1 = "pts3d" if i == 0 else "pts3d_in_other_view"
        r1 = {k1: torch.from_numpy(preds["pts3d_1"][i]),
              "conf": torch.from_numpy(preds["conf_1"][i])}
        r2 = {"pts3d_in_other_view": torch.from_numpy(preds["pts3d_2"][i]),
              "conf": torch.from_numpy(preds["conf_2"][i])}
        ref_preds.append((r1, r2))
    return ref_gts, ref_preds


@requires_reference
@pytest.mark.parametrize("fix_first", [False, True])
def test_conf_loss_parity(rng, fix_first):
    import torch
    from dust3r.losses import L21
    from spann3r.loss import ConfLoss_t, Regr3D_t

    gts, preds = _make_data(rng)
    ref_gts, ref_preds = _to_ref(gts, preds)
    crit = ConfLoss_t(Regr3D_t(L21, norm_mode="avg_dis", fix_first=fix_first),
                      alpha=0.4)
    with torch.no_grad():
        ref_loss, ref_details, ref_factor = crit.compute_frame_loss(ref_gts, ref_preds)

    gts_j = {k: jnp.asarray(v) for k, v in gts.items()}
    preds_j = {k: jnp.asarray(v) for k, v in preds.items()}
    loss, details, factor = L.conf_loss_t(gts_j, preds_j, alpha=0.4,
                                          norm_mode=True, fix_first=fix_first)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


@requires_reference
def test_factor_loss_parity_b1(rng):
    """Scale-overshoot penalty: reference broadcasts (K,)-(B,1,1,1) so it is
    only well-defined at B=1 — compare there."""
    import torch
    from dust3r.losses import L21
    from spann3r.loss import ConfLoss_t, Regr3D_t

    global B
    old_b, B = B, 1
    try:
        gts, preds = _make_data(rng)
    finally:
        B = old_b
    ref_gts, ref_preds = _to_ref_b(gts, preds)
    crit = ConfLoss_t(Regr3D_t(L21, norm_mode="avg_dis", fix_first=False), alpha=0.4)
    with torch.no_grad():
        _, _, ref_factor = crit.compute_frame_loss(ref_gts, ref_preds)
    gts_j = {k: jnp.asarray(v) for k, v in gts.items()}
    preds_j = {k: jnp.asarray(v) for k, v in preds.items()}
    _, _, factor = L.conf_loss_t(gts_j, preds_j, alpha=0.4, norm_mode=True,
                                 fix_first=False)
    np.testing.assert_allclose(float(factor), float(ref_factor), rtol=1e-4)


@requires_reference
def test_scale_shift_inv_parity(rng):
    import torch
    from dust3r.losses import L21
    from spann3r.loss import Regr3D_t_ScaleShiftInv

    gts, preds = _make_data(rng)
    # compute OURS first: the reference mutates its inputs in place
    # (Regr3D_t_ShiftInv's `-=` writes through the from_numpy-shared buffers)
    gts_j = {k: jnp.asarray(v) for k, v in gts.items()}
    preds_j = {k: jnp.asarray(v) for k, v in preds.items()}
    gt_pts, pr_l, pr_r, _, _, valids, monitoring = L.regr3d_t_scale_shift_inv(
        gts_j, preds_j, gt_scale=True, norm_mode=False)

    ref_gts, ref_preds = _to_ref(gts, preds)
    crit = Regr3D_t_ScaleShiftInv(L21, norm_mode=False, gt_scale=True)
    with torch.no_grad():
        r_gt, r_pr, _, _, r_masks, r_mon = crit.get_all_pts3d_t(ref_gts, ref_preds)
    r_pr_l, r_pr_r = r_pr

    for i in range(T):
        np.testing.assert_allclose(np.asarray(gt_pts[i]), r_gt[i].numpy(),
                                   rtol=1e-4, atol=1e-4)
    for i in range(T - 1):
        np.testing.assert_allclose(np.asarray(pr_l[i]), r_pr_l[i].numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pr_r[i]), r_pr_r[i].numpy(),
                                   rtol=1e-4, atol=1e-4)
    # the pre-subtraction shifts power eval.py's world-frame re-anchoring
    # (ref eval.py:128-156); reference monitoring stores the batch mean
    np.testing.assert_allclose(float(monitoring["gt_shift_z"].mean()),
                               float(r_mon["gt_shift_z"]), rtol=1e-5)
    np.testing.assert_allclose(float(monitoring["pred_shift_z"].mean()),
                               float(r_mon["pred_shift_z"]), rtol=1e-5)


def test_masked_stats_match_torch_nan(rng):
    import torch

    x = rng.standard_normal((3, 50)).astype(np.float32)
    mask = rng.random((3, 50)) > 0.4
    xt = torch.from_numpy(np.where(mask, x, np.nan))

    from spann3r_tpu.utils.masked import masked_median, masked_quantile
    med = masked_median(jnp.asarray(x), jnp.asarray(mask), axis=-1)
    np.testing.assert_allclose(np.asarray(med),
                               torch.nanmedian(xt, dim=-1).values.numpy(), rtol=1e-6)
    q = masked_quantile(jnp.asarray(x), jnp.asarray(mask), 0.3, axis=-1)
    np.testing.assert_allclose(np.asarray(q),
                               torch.nanquantile(xt, 0.3, dim=-1).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_conf_loss_empty_frame_contributes_zero(rng):
    """A frame with zero valid pixels yields 0, not NaN (ref loss.py:284
    `conf_loss.mean() if conf_loss.numel() > 0 else 0`)."""
    gts, preds = _make_data(rng)
    gts["valid_mask"][1] = False  # frame 1 entirely invalid for all samples
    loss, details, factor = L.conf_loss_t(gts, preds, alpha=0.4,
                                          norm_mode=True)
    assert np.isfinite(float(loss)), float(loss)
    # gradient stays finite too (0-contribution, not NaN-poisoned)
    import jax
    g = jax.grad(lambda p: L.conf_loss_t(
        gts, {**preds, "pts3d_1": p}, alpha=0.4, norm_mode=True)[0])(
        jnp.asarray(preds["pts3d_1"]))
    assert np.isfinite(np.asarray(g)).all()


def test_shift_scale_stats_are_gradient_stopped(rng):
    """ShiftInv/ScaleInv alignment statistics carry no gradient (ref
    @torch.no_grad() get_joint_pointcloud_depth/center_scale)."""
    import jax
    gts, preds = _make_data(rng)
    preds = {k: jnp.asarray(v) for k, v in preds.items()}

    def loss_with(p1):
        gt_pts, pr_l, pr_r, *_ = L.get_all_pts3d_t(
            gts, {**preds, "pts3d_1": p1}, norm_mode=False,
            shift_inv=True, scale_inv=True, gt_scale=True)
        return sum(jnp.sum(p ** 2) for p in pr_l)

    g = jax.grad(loss_with)(jnp.asarray(preds["pts3d_1"]))
    assert np.isfinite(np.asarray(g)).all()

"""Sequence regression losses (TPU rebuild of spann3r/loss.py + dust3r/losses.py).

Pure functions over stacked arrays:
  gts:   {'pts3d': (T,B,H,W,3) world frame, 'valid_mask': (T,B,H,W) bool,
          'camera_pose': (T,B,4,4) cam2world}
  preds: {'pts3d_1','conf_1','pts3d_2','conf_2'} each (T-1,B,H,W,...) from
         models.spann3r.forward_train — all pointmaps already in frame-0
         coordinates (the reference's get_pred_pts3d 'pts3d_in_other_view'
         path, dust3r/inference.py:99-102).

Reference quirk preserved: the avg_dis normalizer divides each sample's
distance-sum by the nnz total summed over the WHOLE batch
(spann3r/loss.py:51) — gt and pred factors share the quirk so their ratio is
unaffected, but the absolute factor matches the reference bit-for-bit.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .utils.geometry import geotrf, inv_se3
from .utils.masked import masked_mean, masked_median, masked_quantile


def l21(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-pixel euclidean distance (ref dust3r/losses.py:52-59)."""
    return jnp.linalg.norm(pred - gt, axis=-1)


# ---------------------------------------------------------------------------
# normalization (ref spann3r/loss.py:22-84)
# ---------------------------------------------------------------------------

def _avg_dis_factor(pts_list, valid_list, fix_first: bool) -> jax.Array:
    """norm_factor (B,): per-sample distance sum / batch-total valid count."""
    n_use = 1 if fix_first else len(pts_list)
    num = 0.0
    den = 0.0
    for pts, valid in zip(pts_list[:n_use], valid_list[:n_use]):
        b = pts.shape[0]
        dis = jnp.linalg.norm(pts, axis=-1)            # (B, H, W)
        m = valid.astype(dis.dtype)
        num = num + jnp.sum(dis * m, axis=(-2, -1))     # (B,)
        den = den + jnp.sum(m)                          # scalar (ref quirk)
    factor = num / (den + 1e-8)
    return jnp.clip(factor, 1e-8)


def normalize_pointcloud_t(pts_l, pts_r, valids, fix_first: bool,
                           ) -> Tuple[list, list, jax.Array]:
    """Joint normalization of predictions: factor from pts_l (+ last pts_r)."""
    factor = _avg_dis_factor(list(pts_l) + [pts_r[-1]], list(valids), fix_first)
    f = factor[:, None, None, None]
    return ([p / f for p in pts_l], [p / f for p in pts_r], factor)


def normalize_gt_t(gt_pts, valids, fix_first: bool) -> Tuple[list, jax.Array]:
    factor = _avg_dis_factor(list(gt_pts), list(valids), fix_first)
    f = factor[:, None, None, None]
    return [p / f for p in gt_pts], factor


# ---------------------------------------------------------------------------
# Regr3D_t core (ref spann3r/loss.py:129-247)
# ---------------------------------------------------------------------------

def get_all_pts3d_t(gts: Dict, preds: Dict, norm_mode: bool = True,
                    gt_scale: bool = False, fix_first: bool = False,
                    dist_clip: float | None = None,
                    shift_inv: bool = False, scale_inv: bool = False):
    """Transform GT into camera-1 frame, collect pred lists, normalize.

    Returns (gt_pts list[T], pr_l list[T-1], pr_r list[T-1], gt_factor,
    pr_factor, valids list[T], monitoring dict).  monitoring carries the
    PRE-subtraction shift/scale values (the reference exposes these via its
    monitoring dict, spann3r/loss.py:321,362 — eval.py re-anchors with them).
    """
    monitoring = {}
    t = gts["pts3d"].shape[0]
    in_cam1 = inv_se3(gts["camera_pose"][0])  # (B,4,4)

    gt_pts = [geotrf(in_cam1, gts["pts3d"][i]) for i in range(t)]
    valids = [gts["valid_mask"][i] for i in range(t)]
    if dist_clip is not None:
        valids = [v & (jnp.linalg.norm(gts["pts3d"][i], axis=-1) <= dist_clip)
                  for i, v in enumerate(valids)]

    pr_l = [preds["pts3d_1"][i] for i in range(t - 1)]
    pr_r = [preds["pts3d_2"][i] for i in range(t - 1)]

    gt_factor = pr_factor = None
    if norm_mode:
        pr_l, pr_r, pr_factor = normalize_pointcloud_t(pr_l, pr_r, valids, fix_first)
        if not gt_scale:
            gt_pts, gt_factor = normalize_gt_t(gt_pts, valids, fix_first)

    if shift_inv:
        # subtract the joint masked median depth (ref loss.py:294-322); the
        # statistics are gradient-stopped like the reference's
        # @torch.no_grad() get_joint_pointcloud_depth (loss.py:87)
        gt_z = jnp.stack([g[..., 2] for g in gt_pts])               # (T,B,H,W)
        pr_z = jnp.stack([p[..., 2] for p in pr_l] + [pr_r[-1][..., 2]])
        vm = jnp.stack(valids)  # pred frames 0..t-2 then t-1 = same order
        gt_shift = jax.lax.stop_gradient(_joint_depth_median(gt_z, vm))
        pr_shift = jax.lax.stop_gradient(_joint_depth_median(pr_z, vm))
        monitoring["gt_shift_z"] = gt_shift
        monitoring["pred_shift_z"] = pr_shift
        gt_pts = [g.at[..., 2].add(-gt_shift[:, None, None]) for g in gt_pts]
        pr_l = [p.at[..., 2].add(-pr_shift[:, None, None]) for p in pr_l]
        pr_r = [p.at[..., 2].add(-pr_shift[:, None, None]) for p in pr_r]

    if scale_inv:
        # median-center / median-norm scale alignment (ref loss.py:325-364);
        # gradient-stopped like @torch.no_grad() get_joint_pointcloud_
        # center_scale (loss.py:106)
        gt_scale_v = jax.lax.stop_gradient(_joint_center_scale(gt_pts, valids))
        pr_scale_v = jax.lax.stop_gradient(
            _joint_center_scale(pr_l + [pr_r[-1]], valids))
        pr_scale_v = jnp.clip(pr_scale_v, 1e-3, 1e3)
        monitoring["gt_scale"] = gt_scale_v
        monitoring["pred_scale"] = pr_scale_v
        if gt_scale:
            r = (gt_scale_v / pr_scale_v)[:, None, None, None]
            pr_l = [p * r for p in pr_l]
            pr_r = [p * r for p in pr_r]
        else:
            r = (pr_scale_v / gt_scale_v)[:, None, None, None]
            pr_l = [p * r for p in pr_l]
            pr_r = [p * r for p in pr_r]
            g = (gt_scale_v / pr_scale_v)[:, None, None, None]
            gt_pts = [x * g for x in gt_pts]

    return gt_pts, pr_l, pr_r, gt_factor, pr_factor, valids, monitoring


def _joint_depth_median(zs: jax.Array, valids: jax.Array,
                        quantile: float = 0.5) -> jax.Array:
    """zs: (K,B,H,W) -> per-batch masked median over all frames (B,)."""
    k, b = zs.shape[:2]
    flat = zs.transpose(1, 0, 2, 3).reshape(b, -1)
    m = valids.transpose(1, 0, 2, 3).reshape(b, -1)
    if quantile == 0.5:
        return masked_median(flat, m, axis=-1)
    return masked_quantile(flat, m, quantile, axis=-1)


def _joint_center_scale(pts_list, valid_list) -> jax.Array:
    """Masked median norm about the masked median center (B,)."""
    b = pts_list[0].shape[0]
    pts = jnp.stack(pts_list).transpose(1, 0, 2, 3, 4).reshape(b, -1, 3)
    m = jnp.stack(valid_list).transpose(1, 0, 2, 3).reshape(b, -1)
    center = jnp.stack([masked_median(pts[..., i], m, axis=-1)
                        for i in range(3)], axis=-1)  # (B,3)
    norm = jnp.linalg.norm(pts - center[:, None, :], axis=-1)
    return masked_median(norm, m, axis=-1)


def regr3d_t_frame_losses(gts: Dict, preds: Dict, **kw):
    """Per-frame L21 losses on both branches (ref loss.py:184-247).

    Returns (losses list of (T-1)*2 per-pixel maps, masks, confs,
    factor_loss, details)."""
    gt_pts, pr_l, pr_r, gt_factor, pr_factor, valids, _ = \
        get_all_pts3d_t(gts, preds, **kw)
    t = len(gt_pts)

    losses, masks, confs = [], [], []
    for i in range(t):
        if i != t - 1:  # left / reference branch
            losses.append(l21(pr_l[i], gt_pts[i]))
            masks.append(valids[i])
            confs.append(preds["conf_1"][i])
        if i != 0:      # right / target branch
            losses.append(l21(pr_r[i - 1], gt_pts[i]))
            masks.append(valids[i])
            confs.append(preds["conf_2"][i - 1])

    # scale-overshoot penalty (ref loss.py:229-237, consumed training.py:217)
    if pr_factor is not None and gt_factor is not None:
        over = pr_factor > gt_factor
        diff = jnp.abs(pr_factor - gt_factor)
        factor_loss = jnp.sum(diff * over) / jnp.clip(jnp.sum(over), 1)
    else:
        factor_loss = jnp.zeros(())

    details = {
        "loss_pts3d_1": masked_mean(losses[0], masks[0]),
        "loss_pts3d_2": masked_mean(losses[1], masks[1]),
    }
    return losses, masks, confs, factor_loss, details


def conf_loss_t(gts: Dict, preds: Dict, alpha: float = 0.4, **kw):
    """Confidence-weighted sequence loss (ref spann3r/loss.py:250-291).

    Returns (scalar loss, details, factor_loss)."""
    losses, masks, confs, factor_loss, details = regr3d_t_frame_losses(gts, preds, **kw)
    conf_losses = []
    conf_sum = 0.0
    for loss, mask, conf in zip(losses, masks, confs):
        logc = jnp.log(conf)
        cl = masked_mean(loss * conf - alpha * logc, mask)
        # a frame with zero valid pixels contributes 0, not NaN (ref
        # loss.py:284 `conf_loss.mean() if conf_loss.numel() > 0 else 0`);
        # conf_mean below is left unguarded like the reference's conf_sum
        cl = jnp.where(jnp.any(mask), cl, 0.0)
        conf_losses.append(cl)
        conf_sum = conf_sum + masked_mean(conf, mask)
    conf_losses = jnp.stack(conf_losses) * 2.0
    loss = jnp.mean(conf_losses)
    details = dict(details, conf_loss_1=conf_losses[0], conf_loss_2=conf_losses[1],
                   conf_mean=conf_sum / len(losses))
    return loss, details, factor_loss


def regr3d_t_scale_shift_inv(gts: Dict, preds: Dict, gt_scale: bool = True,
                             norm_mode: bool = False):
    """Eval alignment criterion (ref Regr3D_t_ScaleShiftInv, eval.py:55).

    Returns the aligned pointmaps + masks for metric computation."""
    return get_all_pts3d_t(gts, preds, norm_mode=norm_mode, gt_scale=gt_scale,
                           shift_inv=True, scale_inv=True)


# ---------------------------------------------------------------------------
# two-view (pairwise DUSt3R-style) losses — ref dust3r/losses.py:140-236
# ---------------------------------------------------------------------------

def _normalize_pair(pts1, pts2, valid1, valid2):
    """avg_dis joint normalization of a two-view pair
    (ref dust3r/utils/geometry.py:246-304).  Per-sample denominator here
    (the two-view reference divides per sample, unlike the sequence loss)."""
    d1 = jnp.linalg.norm(pts1, axis=-1) * valid1
    d2 = jnp.linalg.norm(pts2, axis=-1) * valid2
    nnz = (jnp.sum(valid1, axis=(-2, -1)) + jnp.sum(valid2, axis=(-2, -1)))
    factor = (jnp.sum(d1, axis=(-2, -1)) + jnp.sum(d2, axis=(-2, -1))) \
        / (nnz + 1e-8)
    factor = jnp.clip(factor, 1e-8)[:, None, None, None]
    return pts1 / factor, pts2 / factor


def regr3d_pair(gt1: Dict, gt2: Dict, pred1: Dict, pred2: Dict,
                norm_mode: bool = True, gt_scale: bool = False):
    """Two-view Regr3D (ref dust3r/losses.py:156-192): per-pixel L21 on both
    views in camera-1 coordinates.  Returns (l1, l2, mask1, mask2)."""
    in_cam1 = inv_se3(gt1["camera_pose"])
    gt_pts1 = geotrf(in_cam1, gt1["pts3d"])
    gt_pts2 = geotrf(in_cam1, gt2["pts3d"])
    v1 = gt1["valid_mask"]
    v2 = gt2["valid_mask"]
    pr1 = pred1["pts3d"]
    pr2 = pred2["pts3d_in_other_view"]
    if norm_mode:
        pr1, pr2 = _normalize_pair(pr1, pr2, v1, v2)
        if not gt_scale:
            gt_pts1, gt_pts2 = _normalize_pair(gt_pts1, gt_pts2, v1, v2)
    return l21(pr1, gt_pts1), l21(pr2, gt_pts2), v1, v2


def conf_loss_pair(gt1, gt2, pred1, pred2, alpha: float = 0.2, **kw):
    """Two-view ConfLoss (ref dust3r/losses.py:195-236)."""
    l1, l2, m1, m2 = regr3d_pair(gt1, gt2, pred1, pred2, **kw)
    c1, c2 = pred1["conf"], pred2["conf"]
    cl1 = masked_mean(l1 * c1 - alpha * jnp.log(c1), m1)
    cl2 = masked_mean(l2 * c2 - alpha * jnp.log(c2), m2)
    return cl1 + cl2, {"conf_loss_1": cl1, "conf_loss2": cl2}


def find_opt_scaling(gt_pts1, gt_pts2, pr_pts1, pr_pts2=None,
                     fit_mode: str = "weiszfeld_stop_grad",
                     valid1=None, valid2=None) -> jax.Array:
    """Optimal gt->pred scale via mean / median / Weiszfeld IRLS
    (ref dust3r/inference.py:112-156)."""
    def flat(p, v):
        b = p.shape[0]
        pf = p.reshape(b, -1, 3)
        vf = (v.reshape(b, -1) if v is not None
              else jnp.ones(pf.shape[:2], bool))
        return pf, vf

    g1, m1 = flat(gt_pts1, valid1)
    p1, _ = flat(pr_pts1, valid1)
    if gt_pts2 is not None:
        g2, m2 = flat(gt_pts2, valid2)
        p2, _ = flat(pr_pts2, valid2)
        gt = jnp.concatenate([g1, g2], axis=1)
        pr = jnp.concatenate([p1, p2], axis=1)
        m = jnp.concatenate([m1, m2], axis=1)
    else:
        gt, pr, m = g1, p1, m1

    dot_gp = jnp.sum(pr * gt, axis=-1)
    dot_gg = jnp.sum(jnp.square(gt), axis=-1)

    if fit_mode.startswith("avg"):
        scaling = masked_mean(dot_gp, m, axis=1) / \
            jnp.clip(masked_mean(dot_gg, m, axis=1), 1e-12)
    elif fit_mode.startswith("median"):
        scaling = masked_median(jnp.where(m, dot_gp / jnp.clip(dot_gg, 1e-12),
                                          0.0), m, axis=-1)
    elif fit_mode.startswith("weiszfeld"):
        scaling = masked_mean(dot_gp, m, axis=1) / \
            jnp.clip(masked_mean(dot_gg, m, axis=1), 1e-12)

        def body(_, s):
            dis = jnp.linalg.norm(pr - s[:, None, None] * gt, axis=-1)
            w = 1.0 / jnp.clip(dis, 1e-8)
            return masked_mean(w * dot_gp, m, axis=1) / \
                jnp.clip(masked_mean(w * dot_gg, m, axis=1), 1e-12)

        scaling = jax.lax.fori_loop(0, 10, body, scaling)
    else:
        raise ValueError(f"bad fit_mode {fit_mode}")

    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.clip(scaling, 1e-3)

"""Scene-level reconstruction + alignment shared by eval.py and the
synthetic gates (convergence, int8).

Implements the reference's per-scene eval protocol
(/root/reference/eval.py:100-160): run the streaming reconstruction,
stack the pairwise predictions, scale-shift-invariant alignment against
GT with the GT median-depth re-anchor, and transform into the world
frame of camera 0.
"""
from __future__ import annotations

import numpy as np


def evaluate_scene(params, cfg, prec, batch, offline=False,
                   scene_graph="complete"):
    """Run reconstruction + alignment for one scene.

    batch: collated views of ONE scene (leading axis T, batch dim 1).
    Returns (pts_aligned (T,H,W,3), gt_aligned, masks, colors, fps,
    raw preds, frame order, conf (T,H,W)) — everything in the world frame
    of the first ordered camera, GT scale.
    """
    import jax.numpy as jnp

    from .. import losses as L
    from ..api import reconstruct_video
    from ..utils.geometry import geotrf

    preds, order, fps = reconstruct_video(
        params, cfg, batch["img"], prec, offline=offline,
        scene_graph=scene_graph)

    # stack predictions as (T-1,...) pairs for the alignment criterion
    t = len(preds)
    key = lambda j: "pts3d" if j == 0 else "pts3d_in_other_view"
    pts_seq = np.stack([np.asarray(preds[j][key(j)], np.float32)[0]
                        for j in range(t)])
    conf_seq = np.stack([np.asarray(preds[j]["conf"], np.float32)[0]
                         for j in range(t)])

    ordered = {k: batch[k][order] for k in
               ("pts3d", "valid_mask", "camera_pose", "img")}
    gts = {"pts3d": jnp.asarray(ordered["pts3d"]),
           "valid_mask": jnp.asarray(ordered["valid_mask"]),
           "camera_pose": jnp.asarray(ordered["camera_pose"])}
    # preds_(1/2) layout expected by the criterion: left list = frames
    # 0..T-2, right list = frames 1..T-1 (ref loss.py:137-180)
    preds_j = {"pts3d_1": jnp.asarray(pts_seq[:-1, None]),
               "pts3d_2": jnp.asarray(pts_seq[1:, None]),
               "conf_1": jnp.asarray(conf_seq[:-1, None]),
               "conf_2": jnp.asarray(conf_seq[1:, None])}

    gt_pts, pr_l, pr_r, _, _, valids, monitoring = L.regr3d_t_scale_shift_inv(
        gts, preds_j, gt_scale=True, norm_mode=False)

    # re-anchor into the world frame (ref eval.py:139-156): add back the
    # PRE-subtraction GT median depth shift and transform by camera_pose[0]
    gt_shift = monitoring["gt_shift_z"]
    in_cam1 = jnp.asarray(ordered["camera_pose"][0])

    pts_aligned, gt_aligned = [], []
    for j in range(t):
        p = pr_l[j] if j < t - 1 else pr_r[-1]
        p = p.at[..., 2].add(gt_shift[:, None, None])
        g = gt_pts[j].at[..., 2].add(gt_shift[:, None, None])
        pts_aligned.append(np.asarray(geotrf(in_cam1, p))[0])
        gt_aligned.append(np.asarray(geotrf(in_cam1, g))[0])

    masks = ordered["valid_mask"][:, 0]
    colors = (ordered["img"][:, 0] + 1.0) / 2.0
    return (np.stack(pts_aligned), np.stack(gt_aligned), masks, colors, fps,
            preds, order, conf_seq)

"""Spann3R-TPU demo: incremental (or offline) reconstruction of an image
folder -> PLY / transforms.json / npy exports.

CLI surface mirrors the reference demo.py:26-41; the compute path is the
jitted streaming InferenceEngine.
"""
import argparse
import json
import os
import os.path as osp

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Spann3R-TPU demo", add_help=False)
    p.add_argument("--save_path", type=str, default="./output/demo/")
    p.add_argument("--demo_path", type=str, default="./examples/s00567")
    p.add_argument("--ckpt_path", type=str, default="./checkpoints/spann3r.pth")
    p.add_argument("--dust3r_ckpt", type=str,
                   default="./checkpoints/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth")
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--scenegraph_type", type=str, default="complete")
    p.add_argument("--offline", action="store_true")
    p.add_argument("--conf_thresh", type=float, default=1e-3)
    p.add_argument("--kf_every", type=int, default=10)
    p.add_argument("--vis", action="store_true")
    p.add_argument("--vis_cam", action="store_true")
    p.add_argument("--save_ori", action="store_true")
    p.add_argument("--dynamic", action="store_true")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--int8", type=int, nargs="?", const=1, default=0,
                   help="1 (or bare --int8) = int8 weight-only serving "
                        "(ops/quant.py); 2 = also int8 MXU compute for the "
                        "batched encoder (dynamic activation quant, "
                        "ops/layers.py linear)")
    return p


def load_model(args):
    import jax
    from spann3r_tpu.config import Spann3RConfig, DUSt3RConfig, BF16, FP32
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.utils.torch_ckpt import load_spann3r_checkpoint

    cfg = Spann3RConfig(dust3r=DUSt3RConfig(
        img_size=(args.resolution, args.resolution), head_type="dpt"))
    if osp.exists(args.ckpt_path):
        params = load_spann3r_checkpoint(args.ckpt_path, cfg)
    else:
        print(f"WARNING: checkpoint {args.ckpt_path} not found; "
              f"using random init (smoke-test mode)")
        params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    prec = FP32 if args.fp32 else BF16
    if not args.fp32 and not getattr(args, "int8", False):
        # bf16 weight storage: bit-identical under BF16 (weights are cast
        # to the activation dtype at use anyway; LN + heads stay fp32),
        # halves device residency + transfer (ops/quant.cast_serving_weights)
        from spann3r_tpu.ops.quant import cast_serving_weights
        params = cast_serving_weights(params)
    if getattr(args, "int8", False):
        import jax.numpy as jnp
        from spann3r_tpu.ops.quant import (count_quantized,
                                           quantize_linear_weights)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)
        params = quantize_linear_weights(params)
        print(f"int8 weight-only serving: {count_quantized(params)} matrices")
        if int(getattr(args, "int8", 0)) >= 2:
            # must precede the first jit trace (ops/layers.py contract)
            os.environ["SPANN3R_INT8_ACT"] = "1"
            print("int8 activation compute enabled for batched matmuls")
    return params, cfg, prec


def main(args):
    import jax.numpy as jnp
    from spann3r_tpu.datasets import Demo
    from spann3r_tpu.datasets.loader import collate_views
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.utils.export import transforms_json, write_ply
    from spann3r_tpu.utils.geometry import estimate_focal_weiszfeld
    from spann3r_tpu.utils.pnp import pose_from_pointmap

    workspace = args.save_path
    os.makedirs(workspace, exist_ok=True)
    params, cfg, prec = load_model(args)

    dataset = Demo(ROOT=args.demo_path, resolution=args.resolution,
                   full_video=True, kf_every=args.kf_every)
    views = dataset[0]
    if len(views) < 2:
        raise SystemExit(
            f"error: need at least 2 frames to reconstruct, found "
            f"{len(views)} image(s) in {args.demo_path} "
            f"(kf_every={args.kf_every})")
    batch = collate_views([views])  # {key: (T, 1, ...)}
    demo_name = args.demo_path.rstrip("/").split("/")[-1]
    print(f"Started reconstruction for {demo_name} "
          f"({batch['img'].shape[0]} frames)")

    from spann3r_tpu.api import reconstruct_video
    hw = batch["img"].shape[2:4]
    preds, order, fps = reconstruct_video(
        params, cfg, batch["img"], prec, offline=args.offline,
        scene_graph=args.scenegraph_type)
    print(f"Finished reconstruction for {demo_name}, FPS: {fps:.2f}")

    save_demo_path = osp.join(workspace, demo_name)
    os.makedirs(save_demo_path, exist_ok=True)

    # focal from the first pointmap (ref demo.py:148-151)
    h, w = hw
    pts0 = jnp.asarray(np.asarray(preds[0]["pts3d"], np.float32))
    pp = jnp.asarray([[w / 2.0, h / 2.0]])
    focal = float(estimate_focal_weiszfeld(pts0, pp)[0])
    print(f"Estimated focal of first camera: {focal:.2f} ({w}x{h})")
    intrinsic = np.eye(3)
    intrinsic[0, 0] = intrinsic[1, 1] = focal
    intrinsic[:2, 2] = (w / 2.0, h / 2.0)

    pts_all, pts_gt_all, images_all, masks_all, conf_all, poses_all = \
        [], [], [], [], [], []
    for j, src in enumerate(order):
        key = "pts3d" if j == 0 else "pts3d_in_other_view"
        pts = np.asarray(preds[j][key], np.float32)[0]
        conf = np.asarray(preds[j]["conf"], np.float32)[0]
        image = batch["img"][src, 0]
        pose = pose_from_pointmap(pts, intrinsic)
        poses_all.append(pose if pose is not None else np.eye(4))
        images_all.append((image + 1.0) / 2.0)
        pts_all.append(pts)
        pts_gt_all.append(batch["pts3d"][src, 0])
        masks_all.append(batch["valid_mask"][src, 0])
        conf_all.append(conf)

    images_all = np.stack(images_all)
    pts_all = np.stack(pts_all)
    conf_all = np.stack(conf_all)
    poses_all = np.stack(poses_all)

    np.save(osp.join(save_demo_path, f"{demo_name}.npy"), dict(
        images_all=images_all, pts_all=pts_all,
        pts_gt_all=np.stack(pts_gt_all), masks_all=np.stack(masks_all),
        conf_all=conf_all, poses_all=poses_all, intrinsic=intrinsic))

    # conf-thresholded point cloud (ref demo.py:213-218)
    conf_sig = (conf_all - 1.0) / conf_all
    keep = conf_sig > args.conf_thresh
    ply_name = f"{demo_name}_conf{args.conf_thresh}.ply"
    write_ply(osp.join(save_demo_path, ply_name),
              pts_all[keep], images_all[keep])

    if args.vis:
        from spann3r_tpu.tools.vis import render_frames, vis_pred_and_imgs
        render_frames(pts_all, images_all, None, save_demo_path, mask=keep,
                      dynamic=args.dynamic)
        vis_pred_and_imgs(pts_all, save_demo_path, images_all=images_all,
                          conf_all=conf_sig)

    # Nerfstudio transforms.json (ref demo.py:227-253)
    if args.save_ori:
        scale_factor = float(views[0]["camera_intrinsics"][0, 0])
        focal_ori = focal / scale_factor
        from spann3r_tpu.utils.image import imread_cv2
        img0 = imread_cv2(views[0]["label"])
        h_ori, w_ori = img0.shape[:2]
        paths = [osp.abspath(v["label"]) for v in views]
        tj = transforms_json(h_ori, w_ori, focal_ori, list(poses_all),
                             ply_name, ori_paths=paths)
    else:
        tj = transforms_json(h, w, focal, list(poses_all), ply_name)
    with open(osp.join(save_demo_path, "transforms.json"), "w") as f:
        json.dump(tj, f, indent=4)
    print(f"Saved results to {save_demo_path}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())

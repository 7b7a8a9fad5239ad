"""Spann3R-TPU benchmark evaluation: 7-Scenes / NRGBD / DTU chamfer
accuracy/completion + normal consistency (ref eval.py protocol:
kf_every 20/40/5, median-shift + GT-scale alignment, ICP refinement,
masked metrics)."""
import argparse
import os
import os.path as osp

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Spann3R-TPU evaluation", add_help=False)
    p.add_argument("--exp_path", type=str, default="./checkpoints")
    p.add_argument("--exp_name", type=str, default="ckpt_best")
    p.add_argument("--ckpt", type=str, default="spann3r.pth")
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--datasets", type=str, default="7scenes,NRGBD,DTU")
    p.add_argument("--scenegraph_type", type=str, default="complete")
    p.add_argument("--offline", action="store_true")
    p.add_argument("--resolution", type=int, default=224)
    # NOTE: parsed but unused, faithfully mirroring the reference's own dead
    # argument (ref eval.py:22 defines it; the eval protocol filters by
    # valid_mask only, never by confidence)
    p.add_argument("--conf_thresh", type=float, default=0.0)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--synth_seq_len", type=int, default=16,
                   help="frames per procedural scene for --datasets synth "
                        "(kf_every=2 keeps half); longer scans amortize "
                        "per-scene overheads for steady-state FPS readings")
    p.add_argument("--int8", type=int, nargs="?", const=1, default=0,
                   help="1 (or bare --int8) = int8 weight-only serving; "
                        "2 = also int8 MXU compute for batched matmuls "
                        "(accuracy gated by tools/int8_gate.py)")
    return p


def build_eval_datasets(args):
    from spann3r_tpu.datasets import DTU, NRGBD, SevenScenes

    root = args.data_root
    out = {}
    wanted = args.datasets.split(",")
    if "7scenes" in wanted:
        out["7scenes"] = SevenScenes(split="test", ROOT=osp.join(root, "7scenes"),
                                     resolution=args.resolution, num_seq=1,
                                     full_video=True, kf_every=20)
    if "NRGBD" in wanted:
        out["NRGBD"] = NRGBD(split="test", ROOT=osp.join(root, "neural_rgbd"),
                             resolution=args.resolution, num_seq=1,
                             full_video=True, kf_every=40)
    if "Replica" in wanted:
        from spann3r_tpu.datasets import Replica
        out["Replica"] = Replica(split="test", ROOT=osp.join(root, "replica"),
                                 resolution=args.resolution, num_seq=1,
                                 full_video=True, kf_every=20)
    if "DTU" in wanted:
        out["DTU"] = DTU(split="test", ROOT=osp.join(root, "dtu_test"),
                         resolution=args.resolution, num_seq=1,
                         full_video=True, kf_every=5)
    if "synth" in wanted:
        # procedural scenes with exact GT (datasets/synth.py) — drives the
        # full eval CLI without any downloaded assets; also the int8 /
        # convergence gates' dataset
        from spann3r_tpu.datasets import SynthRoom
        out["synth"] = SynthRoom(num_seq=3, resolution=args.resolution,
                                 seq_len=args.synth_seq_len, kf_every=2,
                                 full_video=True, scene_seed=9)
    return out


def evaluate_scene(params, cfg, prec, batch, args):
    """Run reconstruction + alignment for one scene; returns aligned
    pred/gt clouds, masks, colors, fps.  (Core logic lives in
    spann3r_tpu.tools.eval_pipeline so the synthetic gates reuse it.)"""
    from spann3r_tpu.tools.eval_pipeline import evaluate_scene as _core
    return _core(params, cfg, prec, batch, offline=args.offline,
                 scene_graph=args.scenegraph_type)


def main(args):
    import jax
    from spann3r_tpu.config import (BF16, FP32, DUSt3RConfig, Spann3RConfig)
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.tools.eval_recon import accuracy, completion
    from spann3r_tpu.tools.icp import estimate_normals, registration_icp
    from spann3r_tpu.utils.export import write_ply
    from spann3r_tpu.datasets.loader import collate_views
    from spann3r_tpu.utils.torch_ckpt import load_spann3r_checkpoint

    ckpt_path = osp.join(args.exp_path, args.ckpt)
    exp_path = osp.join(args.exp_path, args.exp_name)
    os.makedirs(exp_path, exist_ok=True)

    cfg = Spann3RConfig(dust3r=DUSt3RConfig(
        img_size=(args.resolution, args.resolution), head_type="dpt"))
    prec = FP32 if args.fp32 else BF16
    if osp.exists(ckpt_path):
        params = load_spann3r_checkpoint(ckpt_path, cfg)
    else:
        print(f"WARNING: {ckpt_path} missing; random init (smoke test)")
        params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    if not args.fp32:
        # bf16 weight storage: bit-identical under BF16 serving (see
        # ops/quant.cast_serving_weights), halves device residency
        from spann3r_tpu.ops.quant import cast_serving_weights
        params = cast_serving_weights(params)
    if args.int8 and not args.fp32:
        from spann3r_tpu.ops.quant import (count_quantized,
                                           quantize_linear_weights)
        params = quantize_linear_weights(params)
        print(f"int8 weight-only serving: {count_quantized(params)} matrices")
        if args.int8 >= 2:
            # must precede the first jit trace (ops/layers.py contract)
            os.environ["SPANN3R_INT8_ACT"] = "1"
            print("int8 activation compute enabled for batched matmuls")

    for name, dataset in build_eval_datasets(args).items():
        save_path = osp.join(exp_path, name + ("_offline" if args.offline else ""))
        os.makedirs(save_path, exist_ok=True)
        log_file = osp.join(save_path, "logs.txt")
        sums = np.zeros(8)
        fps_all = []
        warmed_shapes = set()

        for i in range(len(dataset)):
            views = dataset[i]
            if len(views) < 2:
                print(f"Skipping {name} scene {i}: only {len(views)} "
                      f"keyframe(s) at this kf_every")
                continue
            batch = collate_views([views])
            # compile the reconstruction programs OUTSIDE the per-scene
            # clock, so logged FPS is steady-state like the reference's
            # eager numbers (reconstruct_video's fps otherwise includes
            # first-call jit).  Online: one warm-up covers every scene
            # (>=17 frames so chunk=min(16,T) resolves to the chunk-16
            # program the timed runs use).  Offline: the fused greedy-NBV
            # program is shaped by the scene's frame count, so warm once
            # per distinct T on that scene's exact shapes.
            warm_key = batch["img"].shape[:2] if args.offline else "online"
            if warm_key not in warmed_shapes:
                from spann3r_tpu.api import reconstruct_video
                if args.offline:
                    reconstruct_video(params, cfg, batch["img"], prec,
                                      offline=True,
                                      scene_graph=args.scenegraph_type)
                else:
                    reconstruct_video(params, cfg, batch["img"][:17], prec)
                warmed_shapes.add(warm_key)
            print(f"Started reconstruction for {name} {i + 1}/{len(dataset)}")
            pts, gts, masks, colors, fps, _, _, conf = evaluate_scene(
                params, cfg, prec, batch, args)
            fps_all.append(fps)
            print(f"Finished {name} {i + 1}/{len(dataset)}, FPS: {fps:.2f}")

            m = masks > 0
            pts_m, gts_m, col_m = pts[m], gts[m], colors[m]
            scene_id = views[0]["label"].rsplit("/", 1)[0].replace("/", "_")
            write_ply(osp.join(save_path, f"{scene_id}-mask.ply"), pts_m, col_m)
            write_ply(osp.join(save_path, f"{scene_id}-gt.ply"), gts_m, col_m)
            # per-scene tensor dump, same artifact contract as the reference
            # (ref eval.py:168-180: dict of aligned pred/gt pointmaps, [0,1]
            # images, masks, conf, np.save'd as {scene_id}.npy)
            np.save(osp.join(save_path, f"{scene_id}.npy"),
                    {"images_all": colors.astype(np.float32),
                     "pts_all": pts.astype(np.float32),
                     "pts_gt_all": gts.astype(np.float32),
                     "masks_all": np.asarray(masks),
                     "conf_all": conf.astype(np.float32)})

            threshold = 100 if name == "DTU" else 0.1
            trans = registration_icp(pts_m.reshape(-1, 3),
                                     gts_m.reshape(-1, 3), threshold)
            pts_icp = pts_m.reshape(-1, 3) @ trans[:3, :3].T + trans[:3, 3]

            nrm_p = estimate_normals(pts_icp)
            nrm_g = estimate_normals(gts_m.reshape(-1, 3))
            acc, acc_med, nc1, nc1_med = accuracy(gts_m.reshape(-1, 3),
                                                  pts_icp, nrm_g, nrm_p)
            comp, comp_med, nc2, nc2_med = completion(gts_m.reshape(-1, 3),
                                                      pts_icp, nrm_g, nrm_p)
            sums += np.array([acc, comp, nc1, nc2,
                              acc_med, comp_med, nc1_med, nc2_med])
            with open(log_file, "a") as f:
                f.write(f"Idx: {scene_id}, Acc: {acc}, Comp: {comp}, "
                        f"NC1: {nc1}, NC2: {nc2} - Acc_med: {acc_med}, "
                        f"Comp_med: {comp_med}, NC1_med: {nc1_med}, "
                        f"NC2_med: {nc2_med}\n")

        # average over the scenes actually evaluated — skipped scenes
        # (too few keyframes) must not deflate the averages
        n = len(fps_all)
        if n == 0:
            print(f"{name}: no scene had >=2 keyframes; nothing evaluated")
            with open(log_file, "a") as f:
                f.write(f"Dataset: {name}, no scenes evaluated\n")
            continue
        with open(log_file, "a") as f:
            f.write(f"Dataset: {name}, Accuracy: {sums[0] / n}, "
                    f"Completion: {sums[1] / n}, NC1: {sums[2] / n}, "
                    f"NC2: {sums[3] / n} - Acc_med: {sums[4] / n}, "
                    f"Comp_med: {sums[5] / n}, NC1_med: {sums[6] / n}, "
                    f"NC2_med: {sums[7] / n}\n")
            f.write(f"Average fps: {np.mean(fps_all)}\n")
        print(f"{name}: acc={sums[0] / n:.4f} comp={sums[1] / n:.4f} "
              f"fps={np.mean(fps_all):.2f} ({n}/{len(dataset)} scenes)")


if __name__ == "__main__":
    main(get_args_parser().parse_args())

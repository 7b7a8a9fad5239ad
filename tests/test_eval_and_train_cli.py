"""End-to-end driver smoke tests: eval.py pipeline and training.train loop
on synthetic data with tiny models."""
import json
import os
import os.path as osp

import jax
import numpy as np
import pytest

from spann3r_tpu.config import (DUSt3RConfig, FP32, Spann3RConfig, ViTConfig)
from spann3r_tpu.models import spann3r as sp

HW = (32, 32)


def tiny_cfg():
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)


@pytest.fixture(scope="module")
def seven_scenes_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("7s")
    scene = root / "chess" / "seq-01"
    scene.mkdir(parents=True)
    (root / "chess" / "TestSplit.txt").write_text("sequence1\n")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / f"frame-{i:06d}.color.png"), img)
        depth = (rng.random((480, 640)) * 3000 + 500).astype(np.uint16)
        cv2.imwrite(str(scene / f"frame-{i:06d}.depth.proj.png"), depth)
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.05, 0, 0]
        np.savetxt(str(scene / f"frame-{i:06d}.pose.txt"), pose)
    return str(root)


def test_eval_cli_end_to_end(seven_scenes_root, tmp_path, monkeypatch):
    import eval as eval_cli
    from spann3r_tpu.datasets import SevenScenes

    args = eval_cli.get_args_parser().parse_args([])
    args.exp_path = str(tmp_path)
    args.exp_name = "test"
    args.resolution = 32
    args.fp32 = True
    args.datasets = "7scenes"

    monkeypatch.setattr(
        eval_cli, "build_eval_datasets",
        lambda a: {"7scenes": SevenScenes(
            split="test", ROOT=seven_scenes_root, resolution=32, num_seq=1,
            full_video=True, kf_every=2)})

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)

    import spann3r_tpu.utils.torch_ckpt as ck
    monkeypatch.setattr(eval_cli.sp if hasattr(eval_cli, "sp") else sp,
                        "init_spann3r", lambda *a, **k: params)
    # eval falls back to random init when ckpt missing; pin tiny cfg
    monkeypatch.setattr("spann3r_tpu.config.Spann3RConfig",
                        lambda **kw: cfg)

    eval_cli.main(args)

    log = osp.join(str(tmp_path), "test", "7scenes", "logs.txt")
    assert osp.exists(log)
    content = open(log).read()
    assert "Accuracy" in content and "Average fps" in content
    save_dir = osp.join(str(tmp_path), "test", "7scenes")
    plys = [f for f in os.listdir(save_dir) if f.endswith(".ply")]
    assert len(plys) >= 2  # pred + gt
    # per-scene tensor dump (ref eval.py:168-180 artifact contract)
    npys = [f for f in os.listdir(save_dir) if f.endswith(".npy")]
    assert npys, "per-scene .npy dump missing"
    d = np.load(osp.join(save_dir, npys[0]), allow_pickle=True).item()
    assert set(d) == {"images_all", "pts_all", "pts_gt_all", "masks_all",
                      "conf_all"}
    t = d["pts_all"].shape[0]
    assert d["pts_all"].shape == d["pts_gt_all"].shape == (t, 32, 32, 3)
    assert d["images_all"].shape == (t, 32, 32, 3)
    assert d["masks_all"].shape == d["conf_all"].shape == (t, 32, 32)
    assert d["images_all"].min() >= 0.0 and d["images_all"].max() <= 1.0


def test_eval_cli_offline_warms_outside_clock(seven_scenes_root, tmp_path,
                                              monkeypatch):
    """--offline: the fused greedy-NBV program is compiled OUTSIDE the FPS
    clock, once per distinct scene shape (VERDICT r4 #5) — so each scene
    triggers warm + timed reconstruct_video calls and logs land in the
    *_offline directory."""
    import eval as eval_cli
    import spann3r_tpu.api as api
    from spann3r_tpu.datasets import SevenScenes

    args = eval_cli.get_args_parser().parse_args([])
    args.exp_path = str(tmp_path)
    args.exp_name = "test"
    args.resolution = 32
    args.fp32 = True
    args.offline = True
    args.datasets = "7scenes"

    monkeypatch.setattr(
        eval_cli, "build_eval_datasets",
        lambda a: {"7scenes": SevenScenes(
            split="test", ROOT=seven_scenes_root, resolution=32, num_seq=1,
            full_video=True, kf_every=2)})
    cfg = tiny_cfg()
    monkeypatch.setattr("spann3r_tpu.config.Spann3RConfig", lambda **kw: cfg)

    calls = {"offline": 0}
    orig = api.reconstruct_video

    def counting(*a, **kw):
        if kw.get("offline"):
            calls["offline"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(api, "reconstruct_video", counting)
    eval_cli.main(args)

    # one scene: 1 warm-up (untimed) + 1 timed run
    assert calls["offline"] == 2
    log = osp.join(str(tmp_path), "test", "7scenes_offline", "logs.txt")
    assert osp.exists(log)
    assert "Average fps" in open(log).read()


def test_training_driver_one_epoch(seven_scenes_root, tmp_path, monkeypatch):
    """training.train() end-to-end: synthetic dataset, 1 epoch, tiny model,
    checkpoint written and auto-resume path exercised."""
    from spann3r_tpu import training as tr

    parser = tr.get_args_parser()
    args = parser.parse_args([])
    args.resolution = 32
    args.head_type = "linear"
    args.num_frames = 3
    args.batch_size = 2
    args.batch_size_test = 1
    args.epochs = 1
    args.warmup_epochs = 0
    args.eval_freq = 1
    args.save_freq = 1
    args.keep_freq = 0
    args.print_freq = 1
    args.num_workers = 1
    args.bf16 = 0
    args.output_dir = str(tmp_path / "run")
    args.train_dataset = (
        f"4 @ SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, num_frames=3, min_thresh=1, max_thresh=2)")
    args.test_dataset = (
        f"SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, full_video=True, kf_every=3, seed=777)")

    monkeypatch.setattr(tr, "Spann3RConfig", lambda **kw: tiny_cfg())
    tr.train(args)

    ckpt_dir = osp.join(args.output_dir, "checkpoints")
    assert any("checkpoint-last" in d for d in os.listdir(ckpt_dir))
    log = osp.join(args.output_dir, "log.txt")
    assert osp.exists(log)
    lines = [json.loads(l) for l in open(log)]
    assert any("epoch" in l for l in lines)

    # auto-resume: second invocation restores and finishes instantly
    tr.train(args)


def test_train_loop_lagged_abort(seven_scenes_root, tmp_path, monkeypatch):
    """The training loop's finiteness abort is LAGGED by one step (the host
    checks step N-1's loss after enqueueing step N, so dispatch stays
    pipelined — PERF.md; the on-device optimizer gate guarantees the bad
    update never reached the weights).  A nan loss must still raise."""
    import jax.numpy as jnp

    from spann3r_tpu import training as tr

    parser = tr.get_args_parser()
    args = parser.parse_args([])
    args.resolution = 32
    args.head_type = "linear"
    args.num_frames = 3
    args.batch_size = 2
    args.epochs = 1
    args.warmup_epochs = 0
    args.eval_freq = 0   # no eval epochs
    args.save_freq = 0
    args.keep_freq = 0
    args.print_freq = 100  # no periodic metric sync either
    args.num_workers = 0
    args.bf16 = 0
    args.output_dir = str(tmp_path / "run")
    args.train_dataset = (
        f"4 @ SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, num_frames=3, min_thresh=1, max_thresh=2)")
    args.test_dataset = (
        f"SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, full_video=True, kf_every=3, seed=777)")
    monkeypatch.setattr(tr, "Spann3RConfig", lambda **kw: tiny_cfg())

    calls = {"n": 0}

    def fake_accum(cfg, prec, opt, accum_iter, **kw):
        def step(params, opt_state, batch, rng, lr, alpha):
            calls["n"] += 1
            loss = jnp.float32(np.nan if calls["n"] >= 2 else 1.0)
            return params, opt_state, {"loss": loss,
                                       "grad_norm": jnp.float32(0.0)}
        return step, None, None

    monkeypatch.setattr(tr, "make_accum_train_step", fake_accum)
    with pytest.raises(RuntimeError, match="non-finite"):
        tr.train(args)
    assert calls["n"] >= 2


def test_train_loop_suppressed_streak_abort(seven_scenes_root, tmp_path,
                                            monkeypatch):
    """Persistently non-finite GRADIENTS with a finite loss (bf16 backward
    overflow) would silently freeze training: the on-device gate suppresses
    every update and the lagged loss check never fires.  The loop must abort
    after MAX_SUPPRESSED_STEPS consecutive suppressions instead."""
    import jax.numpy as jnp

    from spann3r_tpu import training as tr

    parser = tr.get_args_parser()
    args = parser.parse_args([])
    args.resolution = 32
    args.head_type = "linear"
    args.num_frames = 3
    args.batch_size = 2
    args.epochs = 2
    args.warmup_epochs = 0
    args.eval_freq = 0
    args.save_freq = 0
    args.keep_freq = 0
    args.print_freq = 100
    args.num_workers = 0
    args.bf16 = 0
    args.output_dir = str(tmp_path / "run")
    args.train_dataset = (
        f"8 @ SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, num_frames=3, min_thresh=1, max_thresh=2)")
    args.test_dataset = (
        f"SevenScenes(split='test', ROOT='{seven_scenes_root}', "
        f"resolution=32, full_video=True, kf_every=3, seed=777)")
    monkeypatch.setattr(tr, "Spann3RConfig", lambda **kw: tiny_cfg())
    monkeypatch.setattr(tr, "MAX_SUPPRESSED_STEPS", 3)

    calls = {"n": 0}

    def fake_accum(cfg, prec, opt, accum_iter, **kw):
        def step(params, opt_state, batch, rng, lr, alpha):
            calls["n"] += 1
            return params, opt_state, {"loss": jnp.float32(1.0),
                                       "grad_norm": jnp.float32(np.nan)}
        return step, None, None

    monkeypatch.setattr(tr, "make_accum_train_step", fake_accum)
    with pytest.raises(RuntimeError, match="consecutive non-finite-gradient"):
        tr.train(args)
    assert calls["n"] >= 3

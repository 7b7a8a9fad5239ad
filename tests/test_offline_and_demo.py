"""Offline reconstruction + demo/eval pipeline smoke tests (tiny model)."""
import json
import os
import os.path as osp

import jax
import numpy as np
import pytest

from spann3r_tpu.config import (DUSt3RConfig, FP32, MemoryConfig,
                                Spann3RConfig, ViTConfig)
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.models.offline import offline_reconstruction
from spann3r_tpu.models.pairs import make_pairs

HW = (32, 32)


def tiny_cfg():
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)


def test_make_pairs_graphs():
    assert len(make_pairs(4, "complete", symmetrize=False)) == 6
    assert len(make_pairs(4, "complete", symmetrize=True)) == 12
    assert len(make_pairs(5, "oneref-0", symmetrize=False)) == 4
    swin = make_pairs(6, "swin-2", symmetrize=False)
    assert all(a != b for a, b in swin)
    prev = make_pairs(4, "prev", symmetrize=False)
    assert all(a < b for a, b in prev)


def test_offline_reconstruction_tiny(rng):
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((5, *HW, 3)).astype(np.float32) * 0.3
    preds, preds_all, idx_used = offline_reconstruction(
        params, frames, cfg, HW, scene_graph="complete", prec=FP32)
    assert len(preds) == 5
    assert sorted(idx_used) == list(range(5))
    assert "pts3d" in preds[0]
    for p in preds[1:]:
        assert "pts3d_in_other_view" in p
        assert np.isfinite(np.asarray(p["pts3d_in_other_view"])).all()
    assert len(preds_all) == 4


def test_offline_fused_matches_loop(rng):
    """The single-program greedy scan must reproduce the loop path: same
    frame order and same predictions (only XLA fusion boundaries differ)."""
    from spann3r_tpu.models.offline import offline_reconstruction_fused
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((5, *HW, 3)).astype(np.float32) * 0.3
    p_loop, pall_loop, idx_loop = offline_reconstruction(
        params, frames, cfg, HW, scene_graph="complete", prec=FP32)
    p_fused, pall_fused, idx_fused = offline_reconstruction_fused(
        params, frames, cfg, HW, scene_graph="complete", prec=FP32)
    assert idx_fused == idx_loop
    assert len(p_fused) == len(p_loop)
    for a, b in zip(p_fused, p_loop):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=2e-4, atol=2e-4)
    for (a1, a2), (b1, b2) in zip(pall_fused, pall_loop):
        np.testing.assert_allclose(np.asarray(a2["pts3d_in_other_view"]),
                                   np.asarray(b2["pts3d_in_other_view"]),
                                   rtol=2e-4, atol=2e-4)


def test_offline_fused_two_frames(rng):
    from spann3r_tpu.models.offline import offline_reconstruction_fused
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((2, *HW, 3)).astype(np.float32) * 0.3
    preds, preds_all, idx_used = offline_reconstruction_fused(
        params, frames, cfg, HW, prec=FP32)
    assert len(preds) == 2 and len(preds_all) == 1
    assert sorted(idx_used) == [0, 1]


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"frame_{i:03d}.jpg"), img)
    return str(d)


def test_demo_cli_end_to_end(image_folder, tmp_path, monkeypatch):
    """demo.py main() with a tiny random model on a synthetic folder."""
    import sys
    sys.path.insert(0, "/root/repo")
    import demo as demo_cli

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    monkeypatch.setattr(demo_cli, "load_model",
                        lambda args: (params, cfg, FP32))

    args = demo_cli.get_args_parser().parse_args([])
    args.demo_path = image_folder
    args.save_path = str(tmp_path)
    args.resolution = 32
    args.kf_every = 1
    demo_cli.main(args)

    out = osp.join(str(tmp_path), osp.basename(image_folder))
    files = os.listdir(out)
    assert any(f.endswith(".ply") for f in files)
    assert "transforms.json" in files
    tj = json.load(open(osp.join(out, "transforms.json")))
    assert len(tj["frames"]) == 4
    npy = [f for f in files if f.endswith(".npy")]
    assert npy
    data = np.load(osp.join(out, npy[0]), allow_pickle=True).item()
    assert data["pts_all"].shape[0] == 4


def test_demo_cli_offline_mode(image_folder, tmp_path, monkeypatch):
    import demo as demo_cli

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(1), cfg)
    monkeypatch.setattr(demo_cli, "load_model",
                        lambda args: (params, cfg, FP32))
    args = demo_cli.get_args_parser().parse_args([])
    args.demo_path = image_folder
    args.save_path = str(tmp_path)
    args.resolution = 32
    args.kf_every = 1
    args.offline = True
    demo_cli.main(args)
    out = osp.join(str(tmp_path), osp.basename(image_folder))
    assert any(f.endswith(".ply") for f in os.listdir(out))

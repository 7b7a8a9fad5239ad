"""Regression tests for code-review findings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import (DUSt3RConfig, FP32, MemoryConfig,
                                Spann3RConfig, ViTConfig)
from spann3r_tpu.models import dust3r as d3
from spann3r_tpu.models import memory as M
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.models.pairs import make_pairs

from .conftest import requires_reference


@requires_reference
def test_sliding_window_memory_matches_reference(rng):
    """long_mem_size=0 drops the oldest frame instead of pruning
    (ref spann3r/model.py:131-137)."""
    import torch
    from spann3r_tpu.ops.layers import init_layer_norm
    from spann3r.model import SpatialMemory

    d, p = 16, 4
    cfg = MemoryConfig(long_mem_size=0, work_mem_size=2, attn_thresh=0.0,
                       sim_thresh=1.0)
    eye = torch.nn.LayerNorm(d, eps=1e-6).eval()
    ref = SpatialMemory(eye, eye, eye, mem_dropout=None, long_mem_size=0,
                        work_mem_size=2, attn_thresh=0, sim_thresh=1.0)
    state = M.init_memory(1, 64, d, dtype=jnp.float32)
    for t in range(6):
        k = rng.standard_normal((1, p, d)).astype(np.float32)
        ref.add_mem_check(torch.from_numpy(k), torch.from_numpy(k))
        state = M.add_mem_check(state, jnp.asarray(k), jnp.asarray(k), cfg)
        n = int(state.size[0])
        assert n == ref.mem_k.shape[1], f"size diverged at t={t}"
        np.testing.assert_allclose(np.asarray(state.k[:, :n]),
                                   ref.mem_k.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.count[:, :n]),
                                   ref.mem_count[..., 0].detach().numpy())


def test_make_pairs_prefilter_with_view_dicts():
    views = [{"img": None, "idx": i} for i in range(6)]
    pairs = make_pairs(views, "swin-3", prefilter="seq1", symmetrize=False)
    assert pairs
    for a, b in pairs:
        assert abs(a["idx"] - b["idx"]) <= 1


def test_mixed_orientation_pair(rng):
    """A pair where view1 is landscape and view2 is portrait."""
    cfg = DUSt3RConfig(img_size=(48, 32), patch_size=16,
                       enc=ViTConfig(dim=64, depth=2, num_heads=4),
                       dec=ViTConfig(dim=48, depth=12, num_heads=4),
                       head_type="linear")
    params = d3.init_dust3r(jax.random.PRNGKey(0), cfg)
    imgs1 = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
    imgs2 = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
    s1 = np.array([[32, 48]], np.int32)  # landscape
    s2 = np.array([[48, 32]], np.int32)  # portrait (stored transposed)

    r1, r2 = d3.forward_mixed(params, imgs1, imgs2, s1, s2, cfg, FP32)
    assert r1["pts3d"].shape == (1, 32, 48, 3)
    assert r2["pts3d_in_other_view"].shape == (1, 32, 48, 3)

    # view2's output must equal the direct transposed-pair forward
    d1, d2 = d3.forward(params, jnp.asarray(imgs1),
                        jnp.asarray(imgs2.swapaxes(1, 2)), cfg, FP32)
    np.testing.assert_allclose(
        r2["pts3d_in_other_view"][0],
        np.asarray(d2["pts3d_in_other_view"])[0].swapaxes(0, 1),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r1["pts3d"][0], np.asarray(d1["pts3d"])[0],
                               rtol=1e-5, atol=1e-5)


def test_reconstruct_video_multi_stream(rng):
    """B=2 streams through the shared API: per-stream preds, offline guard."""
    from spann3r_tpu.api import reconstruct_video

    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((4, 2, 32, 32, 3)).astype(np.float32) * 0.3

    preds, order, fps = reconstruct_video(params, cfg, frames, FP32, chunk=2)
    assert len(preds) == 4 and order == [0, 1, 2, 3]
    assert preds[0]["pts3d"].shape == (2, 32, 32, 3)  # both streams
    assert np.isfinite(preds[-1]["pts3d_in_other_view"]).all()

    with pytest.raises(ValueError):
        reconstruct_video(params, cfg, frames, FP32, offline=True)


def test_run_video_single_frame_returns_empty(rng):
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    engine = sp.InferenceEngine(params, cfg, (32, 32), FP32)
    frames = rng.standard_normal((1, 1, 32, 32, 3)).astype(np.float32)
    assert engine.run_video(frames, chunk=2) == []

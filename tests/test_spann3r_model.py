"""End-to-end Spann3R forward parity vs the reference torch model.

Full feature dims (1024/768 — hardcoded in the reference's memory modules)
at tiny resolution (64x64 -> 16 tokens) with a shallow encoder, random
weights round-tripped through the checkpoint converter.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import (DUSt3RConfig, FP32, MemoryConfig,
                                Spann3RConfig, ViTConfig)
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

HW = (64, 64)
T = 4


def tiny_cfg() -> Spann3RConfig:
    return Spann3RConfig(
        dust3r=DUSt3RConfig(
            img_size=HW, patch_size=16,
            enc=ViTConfig(dim=1024, depth=2, num_heads=16),
            dec=ViTConfig(dim=768, depth=12, num_heads=12),
            head_type="dpt",
        ),
        memory=MemoryConfig(),
        value_enc_depth=2,
    )


@pytest.fixture(scope="module")
def ref_and_params(tmp_path_factory):
    import torch
    from spann3r.model import Spann3R

    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny_dust3r.pth")
    from dust3r.model import AsymmetricCroCo3DStereo  # noqa: F401 (eval ctx)
    import argparse

    model_str = ("AsymmetricCroCo3DStereo(output_mode='pts3d', head_type='dpt', "
                 "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
                 "enc_embed_dim=1024, enc_depth=2, enc_num_heads=16, "
                 "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
                 "img_size=(64, 64), pos_embed='RoPE100', "
                 "patch_embed_cls='PatchEmbedDust3R', landscape_only=False)")
    inf = float("inf")  # noqa: F841 — name used inside eval'd model string
    net = eval(model_str)
    # torch>=2.6 defaults weights_only=True; allow the Namespace in our
    # synthetic checkpoint so the reference's torch.load can read it
    torch.serialization.add_safe_globals([argparse.Namespace])
    torch.save({"model": net.state_dict(),
                "args": argparse.Namespace(model=model_str)}, path)

    ref = Spann3R(dus3r_name=path).eval()
    # shrink the value encoder to 2 blocks for test speed: rebuild with depth 2
    ref.set_memory_encoder(enc_depth=2)
    ref = ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = tiny_cfg()
    params = ck.convert_spann3r(sd, cfg)
    return ref, params, cfg


def _frames(rng):
    return rng.standard_normal((T, 1, HW[0], HW[1], 3)).astype(np.float32) * 0.5


def _ref_forward(ref, frames_np, training):
    import torch

    views = [{"img": torch.from_numpy(np.transpose(frames_np[t], (0, 3, 1, 2))),
              "true_shape": torch.tensor([[HW[0], HW[1]]]),
              "instance": [str(t)]} for t in range(T)]
    ref.train(training)
    if training:
        ref.mem_dropout.p = 0.0  # deterministic
    with torch.no_grad():
        preds, preds_all = ref.forward(views)
    return preds, preds_all


@requires_reference
def test_inference_engine_parity(rng, ref_and_params):
    ref, params, cfg = ref_and_params
    frames = _frames(rng)
    ref_preds, _ = _ref_forward(ref, frames, training=False)

    engine = sp.InferenceEngine(params, cfg, HW, FP32)
    preds = engine.run(frames)

    assert len(preds) == len(ref_preds) == T
    key0 = "pts3d"
    np.testing.assert_allclose(np.asarray(preds[0][key0]),
                               ref_preds[0][key0].numpy(), rtol=5e-3, atol=5e-3)
    for t in range(1, T):
        np.testing.assert_allclose(
            np.asarray(preds[t]["pts3d_in_other_view"]),
            ref_preds[t]["pts3d_in_other_view"].numpy(), rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(preds[t]["conf"]),
                                   ref_preds[t]["conf"].numpy(),
                                   rtol=5e-3, atol=5e-3)


@requires_reference
@pytest.mark.parametrize("chunk", [2, 8])
def test_run_video_scan_parity(rng, ref_and_params, chunk):
    """Chunked on-device scan == reference online forward (incl. a chunk
    size that splits the video mid-sequence and tail padding)."""
    ref, params, cfg = ref_and_params
    frames = _frames(rng)
    ref_preds, _ = _ref_forward(ref, frames, training=False)

    engine = sp.InferenceEngine(params, cfg, HW, FP32)
    preds = engine.run_video(frames, chunk=chunk)

    assert len(preds) == len(ref_preds) == T
    np.testing.assert_allclose(np.asarray(preds[0]["pts3d"]),
                               ref_preds[0]["pts3d"].numpy(),
                               rtol=5e-3, atol=5e-3)
    for t in range(1, T):
        np.testing.assert_allclose(
            np.asarray(preds[t]["pts3d_in_other_view"]),
            ref_preds[t]["pts3d_in_other_view"].numpy(), rtol=5e-3, atol=5e-3)


@requires_reference
def test_forward_train_parity(rng, ref_and_params):
    ref, params, cfg = ref_and_params
    frames = _frames(rng)
    _, ref_all = _ref_forward(ref, frames, training=True)

    out = sp.forward_train(params, jnp.asarray(frames).transpose(1, 0, 2, 3, 4),
                           cfg, FP32, rng=None, remat=False)
    # out arrays: (T-1, B, H, W, ...)
    for i in range(T - 1):
        r1, r2 = ref_all[i]
        p1 = r1.get("pts3d", r1.get("pts3d_in_other_view")).numpy()
        np.testing.assert_allclose(np.asarray(out["pts3d_1"][i]), p1,
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["pts3d_2"][i]),
                                   r2["pts3d_in_other_view"].numpy(),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["conf_1"][i]),
                                   r1["conf"].numpy(), rtol=5e-3, atol=5e-3)


def test_forward_train_grads_finite(rng):
    """Training scan is differentiable end-to-end (remat on)."""
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(rng.standard_normal((1, 3, HW[0], HW[1], 3)), jnp.float32)

    def loss_fn(p):
        out = sp.forward_train(p, frames, cfg, FP32,
                               rng=jax.random.PRNGKey(1), remat=True)
        return jnp.mean(jnp.square(out["pts3d_1"])) + jnp.mean(out["conf_2"])

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # gradients flow into the memory pathway params
    gv = jax.tree.leaves(g["value_encoder"]) + jax.tree.leaves(g["attn_head_1"])
    assert any(float(jnp.abs(l).max()) > 0 for l in gv)


def test_engine_programs_shared_across_instances():
    """Serving engines with equal (cfg, hw, precision) share ONE set of
    jitted programs (models/spann3r._engine_programs lru_cache), so
    multi-scene drivers (eval.py: one engine per scene) trace once per
    process.  Distinct configs must NOT share."""
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=HW, patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=2, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    e1 = sp.InferenceEngine(params, cfg, HW, FP32)
    e2 = sp.InferenceEngine(params, cfg, HW, FP32)
    for name in ("_encode", "_fused", "_head2_jit", "_scan_chunk"):
        assert getattr(e1, name) is getattr(e2, name), name
    e3 = sp.InferenceEngine(params, cfg, (32, 32), FP32)
    assert e3._fused is not e1._fused

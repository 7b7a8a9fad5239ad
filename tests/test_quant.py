"""Int8 weight-only serving: quantizer structure + accuracy bounds."""
import jax
import jax.numpy as jnp
import numpy as np

from spann3r_tpu.ops import layers
from spann3r_tpu.ops.quant import (count_quantized, quantize_linear_weights,
                                   _quantize_weight)


def test_quant_dequant_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((768, 1024)).astype(np.float32))
    q, scale = _quantize_weight(w)
    deq = q.astype(jnp.float32) * scale
    # symmetric per-out-channel: |err| <= scale/2 = max|w|_col / 254
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(scale)[0] / 2 + 1e-7
    assert (err <= bound[None, :]).all()


def test_structure_selects_linears_only(rng):
    params = {
        "qkv": {"w": jnp.zeros((1024, 3072)), "b": jnp.zeros((3072,))},
        "stacked": {"w": jnp.zeros((24, 768, 3072)), "b": jnp.zeros((24, 3072))},
        "small": {"w": jnp.zeros((4, 16))},
        "conv1x1": {"w": jnp.zeros((1, 1, 1024, 768)), "b": jnp.zeros((768,))},
        "patch": {"proj": {"w": jnp.zeros((16, 16, 3, 1024))}},
    }
    out = quantize_linear_weights(params)
    assert count_quantized(out) == 2
    assert "w_q" in out["qkv"] and "w" not in out["qkv"]
    assert out["qkv"]["w_q"].dtype == jnp.int8
    assert out["stacked"]["w_q"].shape == (24, 768, 3072)
    assert out["stacked"]["w_scale"].shape == (24, 1, 3072)
    # convs and small weights untouched (conv2d has no dequant path)
    assert "w" in out["conv1x1"] and "w_q" not in out["conv1x1"]
    assert "w" in out["small"]
    assert "w" in out["patch"]["proj"]


def test_linear_accuracy_and_scan_slicing(rng):
    w = jnp.asarray(rng.standard_normal((24, 768, 1024)).astype(np.float32)) * 0.02
    b = jnp.asarray(rng.standard_normal((24, 1024)).astype(np.float32)) * 0.01
    x = jnp.asarray(rng.standard_normal((4, 768)).astype(np.float32))
    stacked = quantize_linear_weights({"lin": {"w": w, "b": b}},
                                      min_dim=512)["lin"]

    def body(carry, p):
        return carry, layers.linear(p, x)

    _, ys_q = jax.lax.scan(body, 0, stacked)
    ref = jnp.einsum("bi,lio->lbo", x, w) + b[:, None]
    # per-weight int8 error (<= scale/2) accumulates ~sqrt(in_dim) over the
    # contraction -> expect ~1% of output RMS
    err = np.asarray(ys_q - ref)
    rel_rms = np.linalg.norm(err) / np.linalg.norm(np.asarray(ref))
    assert rel_rms < 0.02, rel_rms
    assert np.max(np.abs(err)) < 0.1


def test_pair_step_outputs_close(rng):
    """Tiny full model: quantized forward stays close to full precision."""
    from spann3r_tpu.config import DUSt3RConfig, Spann3RConfig, ViTConfig, BF16
    from spann3r_tpu.models import dust3r as d3
    from spann3r_tpu.models import spann3r as sp

    hw = (32, 32)
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=hw, patch_size=16,
                            enc=ViTConfig(dim=512, depth=2, num_heads=4),
                            dec=ViTConfig(dim=512, depth=2, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=512, value_enc_heads=4,
        attn_head_in=512 + 512, attn_head_out=512)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.standard_normal((2, *hw, 3)).astype(np.float32)) * 0.3

    def fwd(p):
        feats, pos = d3.encode_image(p["dust3r"], img, cfg.dust3r, BF16)
        f1, f2 = feats[:1], feats[1:]
        out = sp.pair_step(p, cfg, f1, f1, f2, pos[:1], hw, BF16)
        return out.res1["pts3d"]

    ref = np.asarray(fwd(params))
    qparams = quantize_linear_weights(params, min_dim=256)
    assert count_quantized(qparams) > 10
    got = np.asarray(fwd(qparams))
    # bf16 forward with int8 weights: same scene structure, small drift
    assert np.median(np.abs(got - ref)) < 0.05 * (np.median(np.abs(ref)) + 1)


def test_head_subtrees_not_quantized():
    """Output-regressing heads stay full precision (fp32-heads policy)."""
    import jax.numpy as jnp

    params = {"dust3r": {
        "head1": {"proj": {"w": jnp.zeros((768, 1024)), "b": jnp.zeros((1024,))}},
        "head2": {"proj": {"w": jnp.zeros((768, 1024))}},
        "dec_embed": {"w": jnp.zeros((1024, 768))},
    },
        # attn heads drive the dedup cosine test (check_sim vs sim_thresh);
        # int8 drift could flip keep/skip decisions -> keep full precision
        "attn_head_1": {"fc1": {"w": jnp.zeros((1792, 1792))},
                        "fc2": {"w": jnp.zeros((1792, 1024))}},
        "attn_head_2": {"fc1": {"w": jnp.zeros((1792, 1792))},
                        "fc2": {"w": jnp.zeros((1792, 1024))}},
    }
    out = quantize_linear_weights(params)
    assert "w" in out["dust3r"]["head1"]["proj"]
    assert "w" in out["dust3r"]["head2"]["proj"]
    assert "w_q" in out["dust3r"]["dec_embed"]
    for ah in ("attn_head_1", "attn_head_2"):
        for fc in ("fc1", "fc2"):
            assert "w" in out[ah][fc] and "w_q" not in out[ah][fc]


def test_int8_e2e_chamfer_close_to_bf16(rng):
    """CPU miniature of tools/int8_gate.py: the FULL eval pipeline
    (streaming reconstruction -> scale-shift-invariant alignment ->
    accuracy/completion metrics, the eval.py protocol) with int8
    weight-only serving must track the bf16 pipeline's chamfer closely.
    The TPU gate (tools/int8_gate.py) additionally runs this on weights
    trained by the convergence gate and records the artifact next to the
    README's int8 FPS claim."""
    from spann3r_tpu.config import BF16, DUSt3RConfig, Spann3RConfig, ViTConfig
    from spann3r_tpu.datasets import build_dataset
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.tools.convergence import synth_chamfer

    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=512, depth=2, num_heads=4),
                            dec=ViTConfig(dim=512, depth=2, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=512, value_enc_heads=4,
        attn_head_in=512 + 512, attn_head_out=512)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    ds = build_dataset("SynthRoom(num_seq=1, resolution=32, seq_len=6, "
                       "full_video=True, scene_seed=4)")

    m_bf16 = synth_chamfer(params, cfg, BF16, ds, 1)
    qparams = quantize_linear_weights(params, min_dim=256)
    assert count_quantized(qparams) > 10
    m_int8 = synth_chamfer(qparams, cfg, BF16, ds, 1)

    # same scene, same weights: int8 weight error must not move chamfer by
    # more than a few % of its magnitude (both reconstructions are from the
    # SAME random-init net, so this pins pipeline numerics, not quality)
    rel = abs(m_int8["chamfer"] - m_bf16["chamfer"]) / m_bf16["chamfer"]
    assert rel < 0.10, (m_bf16, m_int8)


def test_cast_serving_weights_bitwise_exact_under_bf16(rng):
    """bf16 weight storage must be BIT-IDENTICAL to fp32 storage under BF16
    serving: linear/conv cast weights to the activation dtype at use, so
    pre-casting the bf16-consumed leaves changes nothing; LN params and
    head subtrees (fp32 use sites) are kept fp32 by cast_serving_weights."""
    import os
    import sys

    import jax

    from spann3r_tpu.config import BF16
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.ops.quant import cast_serving_weights

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_precision_modes import HW, T, _run, tiny_cfg

    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(3), cfg)
    frames = jnp.asarray(rng.standard_normal((T, 1, *HW, 3)), jnp.float32) * .4

    cast = cast_serving_weights(params)
    # structure: LN nodes + heads stay fp32, transformer weights go bf16
    assert cast["norm_q"]["scale"].dtype == jnp.float32
    assert cast["dust3r"]["head1"]["act0_conv"]["w"].dtype == jnp.float32
    assert cast["dust3r"]["enc_blocks"]["attn"]["qkv"]["w"].dtype == jnp.bfloat16
    assert cast["attn_head_1"]["fc1"]["w"].dtype == jnp.bfloat16
    assert cast["dust3r"]["enc_norm"]["scale"].dtype == jnp.float32

    pts_a, conf_a, em_a = _run(params, cfg, frames, BF16)
    pts_b, conf_b, em_b = _run(cast, cfg, frames, BF16)
    np.testing.assert_array_equal(pts_a, pts_b)
    np.testing.assert_array_equal(conf_a, conf_b)
    np.testing.assert_array_equal(em_a, em_b)


def test_int8_activation_path(rng, monkeypatch):
    """SPANN3R_INT8_ACT: dynamic per-row activation quantization feeding an
    int8 x int8 -> int32 MXU dot (ops/layers.py linear).  Checks (a) the
    path only engages above the static row-count floor (B=1 decode shapes
    keep the weight-only path), (b) accuracy stays within the combined
    weight+activation int8 bound, (c) bf16 inputs round-trip."""
    w = jnp.asarray(rng.standard_normal((768, 1024)).astype(np.float32)) * .02
    b = jnp.asarray(rng.standard_normal((1024,)).astype(np.float32)) * .01
    p = quantize_linear_weights({"lin": {"w": w, "b": b}})["lin"]
    big = jnp.asarray(rng.standard_normal((2048, 768)).astype(np.float32))
    small = big[:4]

    ref_big = big @ w + b
    ref_small = small @ w + b

    monkeypatch.setenv("SPANN3R_INT8_ACT", "1")
    y_big = layers.linear(p, big)
    y_small = layers.linear(p, small)
    monkeypatch.delenv("SPANN3R_INT8_ACT")
    y_off = layers.linear(p, big)

    # (a) below the 1024-row floor the weight-only dequant path is used:
    # identical to the flag-off path on the same rows
    np.testing.assert_array_equal(np.asarray(y_small),
                                  np.asarray(layers.linear(p, small)))
    # (b) int8 activations add ~1/254-of-row-max error per element over a
    # 768-long contraction: ~1-2% output RMS, same order as weight-only
    rel = (np.linalg.norm(np.asarray(y_big - ref_big))
           / np.linalg.norm(np.asarray(ref_big)))
    assert rel < 0.03, rel
    rel_off = (np.linalg.norm(np.asarray(y_off - ref_big))
               / np.linalg.norm(np.asarray(ref_big)))
    assert rel_off < 0.02  # weight-only stays tighter

    # (c) bf16 activations take the same path and stay bf16
    monkeypatch.setenv("SPANN3R_INT8_ACT", "1")
    y_bf = layers.linear(p, big.astype(jnp.bfloat16))
    assert y_bf.dtype == jnp.bfloat16
    rel_bf = (np.linalg.norm(np.asarray(y_bf, np.float32) - np.asarray(ref_big))
              / np.linalg.norm(np.asarray(ref_big)))
    assert rel_bf < 0.04, rel_bf

    # custom floor: SPANN3R_INT8_ACT=<n>
    monkeypatch.setenv("SPANN3R_INT8_ACT", "2")
    assert layers._int8_act_min_rows() == 2


def test_pair_step_outputs_close_int8_act(rng, monkeypatch):
    """Tiny full model with int8 ACTIVATION compute on top of int8 weights
    (SPANN3R_INT8_ACT low floor so the small shapes engage): forward stays
    close to full precision."""
    from spann3r_tpu.config import DUSt3RConfig, Spann3RConfig, ViTConfig, BF16
    from spann3r_tpu.models import dust3r as d3
    from spann3r_tpu.models import spann3r as sp

    hw = (32, 32)
    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=hw, patch_size=16,
                            enc=ViTConfig(dim=512, depth=2, num_heads=4),
                            dec=ViTConfig(dim=512, depth=2, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=512, value_enc_heads=4,
        attn_head_in=512 + 512, attn_head_out=512)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.standard_normal((2, *hw, 3)).astype(np.float32)) * 0.3

    def fwd(p):
        feats, pos = d3.encode_image(p["dust3r"], img, cfg.dust3r, BF16)
        f1, f2 = feats[:1], feats[1:]
        out = sp.pair_step(p, cfg, f1, f1, f2, pos[:1], hw, BF16)
        return out.res1["pts3d"]

    ref = np.asarray(fwd(params))
    qparams = quantize_linear_weights(params, min_dim=256)
    monkeypatch.setenv("SPANN3R_INT8_ACT", "2")  # engage at tiny shapes
    got = np.asarray(fwd(qparams))
    assert np.median(np.abs(got - ref)) < 0.06 * (np.median(np.abs(ref)) + 1)

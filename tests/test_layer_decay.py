"""Layer-decay LR scales vs the reference's param groups.

The reference buckets parameters into per-layer optimizer groups
(croco/utils/misc.py:404-460 get_parameter_groups, layer ids from
_get_num_layer_for_vit misc.py:385-402).  We implement the same scaling as
one elementwise multiply over the pytree (training.layer_lr_scales); this
test checks every leaf's multiplier against the reference's formula applied
to the corresponding torch parameter name.
"""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, ViTConfig
from spann3r_tpu.models import croco_pretrain as cp
from spann3r_tpu.pretraining import make_pretrain_optimizer, make_pretrain_step
from spann3r_tpu.training import layer_lr_scales

from .conftest import requires_reference

ENC_DEPTH, DEC_DEPTH = 3, 2
LD = 0.75


def tiny_cfg() -> DUSt3RConfig:
    return DUSt3RConfig(
        img_size=(32, 32), patch_size=16,
        enc=ViTConfig(dim=32, depth=ENC_DEPTH, num_heads=2, rope_base=0.0),
        dec=ViTConfig(dim=24, depth=DEC_DEPTH, num_heads=2, rope_base=0.0))


def _leaf_scale(scales, key, row=None) -> float:
    leaves = jax.tree.leaves(scales[key])
    vals = set()
    for lf in leaves:
        v = np.asarray(lf, np.float64)
        vals.add(float(v.reshape(-1)[0] if row is None else
                       v[row].reshape(-1)[0]))
    assert len(vals) == 1, (key, vals)
    return vals.pop()


@requires_reference
def test_scales_match_reference_formula():
    spec = importlib.util.spec_from_file_location(
        "ref_croco_misc", "/root/reference/croco/utils/misc.py")
    misc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(misc)

    cfg = tiny_cfg()
    params = cp.init_croco(jax.random.PRNGKey(0), cfg)
    scales = layer_lr_scales(params, ENC_DEPTH, DEC_DEPTH, LD)

    num_layers = ENC_DEPTH + DEC_DEPTH

    def ref_scale(torch_name: str) -> float:
        lid = misc._get_num_layer_for_vit(torch_name, ENC_DEPTH, DEC_DEPTH)
        return LD ** (num_layers + 1 - lid)

    assert _leaf_scale(scales, "patch_embed") == pytest.approx(
        ref_scale("patch_embed.proj.weight"))
    assert _leaf_scale(scales, "mask_token") == pytest.approx(
        ref_scale("mask_token"))
    for i in range(ENC_DEPTH):
        assert _leaf_scale(scales, "enc_blocks", row=i) == pytest.approx(
            ref_scale(f"enc_blocks.{i}.attn.qkv.weight"))
    assert _leaf_scale(scales, "enc_norm") == pytest.approx(
        ref_scale("enc_norm.weight"))
    assert _leaf_scale(scales, "decoder_embed") == pytest.approx(
        ref_scale("decoder_embed.weight"))
    for i in range(DEC_DEPTH):
        assert _leaf_scale(scales, "dec_blocks", row=i) == pytest.approx(
            ref_scale(f"dec_blocks.{i}.mlp.fc1.weight"))
    assert _leaf_scale(scales, "dec_norm") == pytest.approx(
        ref_scale("dec_norm.weight"))
    assert _leaf_scale(scales, "prediction_head") == pytest.approx(
        ref_scale("prediction_head.weight"))


def test_scaled_step_runs_and_identity_at_one():
    cfg = tiny_cfg()
    params = cp.init_croco(jax.random.PRNGKey(0), cfg)
    opt = make_pretrain_optimizer(0.05)

    img = np.random.default_rng(0).standard_normal((2, 32, 32, 3)) \
        .astype(np.float32)
    rng = jax.random.PRNGKey(1)

    def run(lr_scales):
        step, _, _ = make_pretrain_step(cfg, 0.5, FP32, opt,
                                        lr_scales=lr_scales)
        p = jax.tree.map(jnp.array, params)  # fresh buffers (step donates)
        return step(p, opt.init(p), jnp.asarray(img), jnp.asarray(img),
                    rng, jnp.float32(1e-3))

    ones = jax.tree.map(lambda x: jnp.ones((), jnp.float32),
                        layer_lr_scales(params, ENC_DEPTH, DEC_DEPTH, LD))
    p_none, _, l_none = run(None)
    p_ones, _, l_ones = run(ones)
    assert np.isfinite(float(l_none)) and float(l_none) == float(l_ones)
    for a, b in zip(jax.tree.leaves(p_none), jax.tree.leaves(p_ones)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # with decay < 1, shallow layers move less than the head per unit lr
    scales = layer_lr_scales(params, ENC_DEPTH, DEC_DEPTH, LD)
    p_ld, _, _ = run(scales)

    def mean_delta(tree, key):
        return float(np.mean([np.abs(np.asarray(a) - np.asarray(b)).mean()
                              for a, b in zip(jax.tree.leaves(tree[key]),
                                              jax.tree.leaves(params[key]))]))

    ratio_pe = mean_delta(p_ld, "patch_embed") / mean_delta(p_none,
                                                            "patch_embed")
    ratio_head = mean_delta(p_ld, "prediction_head") / mean_delta(
        p_none, "prediction_head")
    assert ratio_pe == pytest.approx(LD ** (ENC_DEPTH + DEC_DEPTH + 1),
                                     rel=1e-3)
    assert ratio_head == pytest.approx(1.0, rel=1e-3)

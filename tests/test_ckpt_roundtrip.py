"""Checkpoint conversion round-trip: pytree -> torch state_dict -> pytree."""
import jax
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, Spann3RConfig, ViTConfig
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.utils import torch_ckpt as ck


def tiny_cfg(head_type="dpt"):
    return Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=32, depth=2, num_heads=4),
                            dec=ViTConfig(dim=24, depth=12, num_heads=4),
                            head_type=head_type),
        value_enc_depth=2, value_enc_dim=32, value_enc_heads=4,
        attn_head_in=32 + 24, attn_head_out=32)


@pytest.mark.parametrize("head_type", ["linear", "dpt"])
def test_spann3r_roundtrip(head_type):
    cfg = tiny_cfg(head_type)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    sd = ck.to_torch_state_dict_spann3r(params, cfg)
    back = ck.convert_spann3r(sd, cfg)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    for k, v in flat1:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[key]),
                                   rtol=1e-6, err_msg=key)


def test_state_dict_keys_match_reference_naming():
    cfg = tiny_cfg("dpt")
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    sd = ck.to_torch_state_dict_spann3r(params, cfg)
    expected = [
        "dust3r.patch_embed.proj.weight",
        "dust3r.enc_blocks.0.attn.qkv.weight",
        "dust3r.dec_blocks2.11.cross_attn.projq.weight",
        "dust3r.downstream_head1.dpt.scratch.refinenet4.out_conv.bias",
        "dust3r.downstream_head2.dpt.head.4.weight",
        "value_encoder.1.mlp.fc2.weight",
        "attn_head_2.0.bias",
        "pos_patch_embed.proj.weight",
        "norm_q.weight",
    ]
    for k in expected:
        assert k in sd, f"missing reference key {k}"

"""Checkpoint-ingestion last mile: synthesize zipfile-format .pth files whose
state-dict key sets exactly replicate the published DUSt3R-512-dpt and
Spann3R checkpoints (full production architecture: ViT-L encoder, dual
ViT-B decoders, DPT heads, ManyAR patch embed), push them through BOTH the
reference's own load path and our converter, and check full-architecture
two-view forward parity.  After this, the only unverified artifact left is
the published weight values themselves.

Reference protocol: dust3r/model.py:27-51 (load_model eval of the ckpt args
string), :94-101 (dec_blocks2 duplication), spann3r/model.py:213-261 and
demo.py's `model.load_state_dict(torch.load(ckpt)['model'])`.
"""
import argparse
import os.path as osp

import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, Spann3RConfig
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

# the published DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth carries this model
# string in ckpt['args'].model; the reference loader eval()s it
# (dust3r/model.py:37-47)
PUBLISHED_MODEL_STR = (
    "AsymmetricCroCo3DStereo(pos_embed='RoPE100', patch_embed_cls="
    "'ManyAR_PatchEmbed', img_size=(512, 512), head_type='dpt', "
    "output_mode='pts3d', depth_mode=('exp', -inf, inf), conf_mode="
    "('exp', 1, inf), enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
    "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, landscape_only=False)")

# state-dict keys that legitimately do not round-trip through the converter:
# scratch.layer_rn.{i} aliases scratch.layer{i+1}_rn (shared nn.Conv2d, both
# names serialize the same tensor), mask_token is a CroCo pretraining vestige
# unused by the dust3r forward pass
ALIAS_OR_VESTIGIAL = {"mask_token"} | {
    f"downstream_head{h}.dpt.scratch.layer_rn.{i}.weight"
    for h in (1, 2) for i in range(4)}


def build_reference_dust3r_full():
    import torch
    from dust3r.model import AsymmetricCroCo3DStereo

    torch.manual_seed(0)
    return AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="dpt",
        depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")),
        img_size=(512, 512), patch_size=16,
        enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
        dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        pos_embed="RoPE100", landscape_only=True,
        patch_embed_cls="ManyAR_PatchEmbed",
    ).eval()


@pytest.fixture(scope="module")
def published_files(tmp_path_factory):
    """(dust3r_path, spann3r_path, ref_spann3r_model) with the published
    on-disk layout: dust3r .pth = {'args': Namespace, 'model': sd},
    spann3r .pth = {'model': sd} (zipfile torch.save format)."""
    import torch
    from spann3r.model import Spann3R as RefSpann3R

    root = tmp_path_factory.mktemp("published")
    d3_path = str(root / "DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth")
    sp_path = str(root / "spann3r.pth")

    net = build_reference_dust3r_full()
    torch.save({"args": argparse.Namespace(model=PUBLISHED_MODEL_STR),
                "model": net.state_dict()}, d3_path)

    # the reference's own loader consumes our synthetic file (validates the
    # args-string eval path + key layout end-to-end); torch>=2.6 defaults
    # weights_only=True, which the real published file also needs opt-out for
    torch.manual_seed(1)
    with torch.serialization.safe_globals([argparse.Namespace]):
        ref_sp = RefSpann3R(dus3r_name=d3_path).eval()
    torch.save({"model": ref_sp.state_dict()}, sp_path)
    return d3_path, sp_path, ref_sp


@requires_reference
def test_published_dust3r_roundtrip(published_files):
    """Converter consumes the exact published DUSt3R key set; reverse
    conversion reproduces every tensor bit-exactly."""
    d3_path, _, _ = published_files
    sd = ck.load_torch_state_dict(d3_path)
    cfg = DUSt3RConfig()
    params = ck.convert_dust3r(sd, cfg)
    rt = ck.to_torch_state_dict_dust3r(params, cfg)

    missing = set(sd) - set(rt)
    assert missing == ALIAS_OR_VESTIGIAL, (
        f"unconsumed non-alias keys: {sorted(missing - ALIAS_OR_VESTIGIAL)}")
    assert not set(rt) - set(sd), f"fabricated keys: {sorted(set(rt) - set(sd))}"
    for k, v in rt.items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)
    # the layer_rn aliases really are weight-shares of layer{i+1}_rn
    for h in (1, 2):
        for i in range(4):
            np.testing.assert_array_equal(
                sd[f"downstream_head{h}.dpt.scratch.layer_rn.{i}.weight"],
                sd[f"downstream_head{h}.dpt.scratch.layer{i + 1}_rn.weight"])


@requires_reference
def test_published_spann3r_roundtrip(published_files):
    _, sp_path, ref_sp = published_files
    sd = ck.load_torch_state_dict(sp_path)
    cfg = Spann3RConfig()
    params = ck.convert_spann3r(sd, cfg)
    rt = ck.to_torch_state_dict_spann3r(params, cfg)

    aliases = {"dust3r." + k for k in ALIAS_OR_VESTIGIAL}
    missing = set(sd) - set(rt)
    assert missing == aliases, (
        f"unconsumed non-alias keys: {sorted(missing - aliases)}")
    assert not set(rt) - set(sd)
    for k, v in rt.items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)

    # production shapes really are production
    assert params["dust3r"]["enc_blocks"]["attn"]["qkv"]["w"].shape == \
        (24, 1024, 3072)
    assert params["attn_head_1"]["fc1"]["w"].shape == (1792, 1792)
    assert params["value_encoder"]["mlp"]["fc1"]["w"].shape == (6, 1024, 4096)


@requires_reference
def test_full_arch_two_view_forward_parity(published_files):
    """ViT-L / dual ViT-B / DPT two-view forward: converted weights vs the
    reference torch model, fp32, 224x224 inputs (RoPE makes the production
    512-trained architecture resolution-agnostic), handful-of-pixels check."""
    import torch

    from spann3r_tpu.models import dust3r as d3

    d3_path, _, ref_sp = published_files
    net = ref_sp.dust3r.eval()

    cfg = DUSt3RConfig(img_size=(224, 224))
    params = ck.load_dust3r_checkpoint(d3_path, cfg)

    rng = np.random.default_rng(42)
    img1 = (rng.standard_normal((1, 3, 224, 224)) * 0.5).astype(np.float32)
    img2 = (rng.standard_normal((1, 3, 224, 224)) * 0.5).astype(np.float32)
    shape = torch.tensor([[224, 224]])
    with torch.no_grad():
        ref1, ref2 = net({"img": torch.from_numpy(img1), "true_shape": shape,
                          "instance": ["0"]},
                         {"img": torch.from_numpy(img2), "true_shape": shape,
                          "instance": ["1"]})

    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    res1, res2 = d3.forward(params, j1, j2, cfg, FP32)

    # handful of fixed pixels spread over the map
    ys = np.array([0, 17, 100, 150, 223])
    xs = np.array([0, 60, 111, 190, 223])
    got = np.asarray(res1["pts3d"])[0][ys, xs]
    want = ref1["pts3d"].numpy()[0][ys, xs]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    got2 = np.asarray(res2["pts3d_in_other_view"])[0][ys, xs]
    want2 = ref2["pts3d_in_other_view"].numpy()[0][ys, xs]
    np.testing.assert_allclose(got2, want2, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res1["conf"])[0][ys, xs],
                               ref1["conf"].numpy()[0][ys, xs],
                               rtol=2e-3, atol=2e-3)

"""Full published-architecture gate.

1. Key inventory: the EXACT state_dict key set of the reference Spann3R at
   the published configuration (ViT-L/24 encoder + dual ViT-B/12 decoders +
   DPT heads + 6-block value encoder, ref dust3r/model.py:36-47 model
   string, spann3r/model.py:214-261) must equal what the converter
   consumes/produces — zero ignored reference keys, zero extras.  A
   checked-in snapshot (tests/data/spann3r_published_keys.txt) pins the
   inventory even when the reference repo is absent.

2. Opt-in full-depth numeric parity (SPANN3R_FULL_PARITY=1): forward the
   full architecture at 224 res against the reference torch model with
   random converted weights — closes the depth-24 error-accumulation /
   RoPE-cache / converter-coverage gap the shallow parity tests leave.
"""
import os
import os.path as osp

import jax
import numpy as np
import pytest

from spann3r_tpu.config import FP32, DUSt3RConfig, Spann3RConfig
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

KEYS_SNAPSHOT = osp.join(osp.dirname(__file__), "data",
                         "spann3r_published_keys.txt")

# the model string stored in the published DUSt3R_ViTLarge_BaseDecoder_512_dpt
# checkpoint (ref dust3r/model.py:36-47 rewrites patch_embed_cls +
# landscape_only on load; spann3r loads it with landscape_only=True)
_MODEL_STR_TMPL = (
    "AsymmetricCroCo3DStereo(output_mode='pts3d', head_type='dpt', "
    "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
    "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
    "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
    "img_size={img_size}, pos_embed='RoPE100', "
    "patch_embed_cls='PatchEmbedDust3R', landscape_only=False)")
PUBLISHED_MODEL_STR = _MODEL_STR_TMPL.format(img_size="(224, 224)")


def _build_reference_full(tmpdir: str, model_str: str = PUBLISHED_MODEL_STR):
    """Reference Spann3R at the FULL published architecture (random init)."""
    import argparse

    import torch
    from dust3r.model import AsymmetricCroCo3DStereo  # noqa: F401 (eval ctx)
    from spann3r.model import Spann3R

    torch.manual_seed(0)
    inf = float("inf")  # noqa: F841 — used inside the eval'd model string
    net = eval(model_str)
    path = osp.join(tmpdir, "full_dust3r.pth")
    torch.serialization.add_safe_globals([argparse.Namespace])
    torch.save({"model": net.state_dict(),
                "args": argparse.Namespace(model=model_str)}, path)
    return Spann3R(dus3r_name=path).eval()


@requires_reference
def test_published_key_inventory_roundtrip(tmp_path):
    """Converter consumes the exact published key set: forward conversion
    then reverse export reproduces every reference key, none ignored."""
    ref = _build_reference_full(str(tmp_path))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = Spann3RConfig(dust3r=DUSt3RConfig(img_size=(224, 224)))
    params = ck.convert_spann3r(sd, cfg)
    back = ck.to_torch_state_dict_spann3r(params, cfg)

    ref_keys = set(sd)
    out_keys = set(back)
    # the only reference keys without a pytree home are documented
    # aliases/vestigials (torch_ckpt._ALIAS_OR_VESTIGIAL)
    dropped = ref_keys - out_keys
    expected_drop = {k for k in ref_keys if ck.is_alias_or_vestigial_key(k)}
    assert dropped == expected_drop, \
        f"converter silently drops: {sorted(dropped - expected_drop)[:10]}"
    assert out_keys - ref_keys == set(), \
        f"keys the converter invents: {sorted(out_keys - ref_keys)[:10]}"
    # the layer_rn "dropped" keys really are aliases of the converted ones
    for k in expected_drop:
        if "layer_rn" not in k:
            continue
        n = int(k.split("layer_rn.")[1].split(".")[0])
        primary = k.replace(f"layer_rn.{n}", f"layer{n + 1}_rn")
        np.testing.assert_array_equal(sd[k], sd[primary])
    # every consumed tensor round-trips shape-exact
    for k in sorted(out_keys):
        assert back[k].shape == sd[k].shape, k

    # snapshot parity (regenerate with this test if the architecture moves)
    snap = sorted(open(KEYS_SNAPSHOT).read().split())
    assert snap == sorted(ref_keys), "checked-in key snapshot is stale"


def test_key_snapshot_covered_by_converter():
    """Reference-free guard: the converter's reverse export from a
    freshly-initialized full-architecture pytree covers the snapshot."""
    cfg = Spann3RConfig(dust3r=DUSt3RConfig(img_size=(224, 224)))
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    back = ck.to_torch_state_dict_spann3r(params, cfg)
    snap = set(open(KEYS_SNAPSHOT).read().split())
    covered = {k for k in snap if not ck.is_alias_or_vestigial_key(k)}
    assert set(back) == covered


PARITY_ARTIFACT = osp.join(osp.dirname(__file__), "data",
                           "full_parity_latest.json")


@pytest.mark.skipif(not os.environ.get("SPANN3R_FULL_PARITY"),
                    reason="opt-in slow full-architecture parity: set "
                           "SPANN3R_FULL_PARITY=1")
@requires_reference
@pytest.mark.parametrize("hw,ref_img_size", [
    ((224, 224), "(224, 224)"),
    # the 512x384 serving flagship: 768 tokens/frame, the 512 RoPE caches
    # and the non-square DPT reassembly path (VERDICT r4 #4); the published
    # 512 ckpt declares img_size=(512, 512) and forwards any multiple of 16
    # (ref dust3r/patch_embed.py:20-29, dust3r/model.py:36-44)
    ((384, 512), "(512, 512)"),
], ids=["224", "512x384"])
def test_full_architecture_forward_parity(tmp_path, rng, hw, ref_img_size):
    """ViT-L/24 + dual ViT-B/12 + DPT: repo forward == reference torch
    forward with converted random weights (online eval semantics), at the
    224 eval res AND the 512x384 serving flagship res.

    Each run records a checked-in artifact (tests/data/full_parity_latest.json)
    with per-output max-abs errors, the config string and the run date, so the
    parity claim is pinned to evidence instead of a changelog line."""
    import datetime
    import json

    import torch

    ref = _build_reference_full(
        str(tmp_path), _MODEL_STR_TMPL.format(img_size=ref_img_size))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = Spann3RConfig(dust3r=DUSt3RConfig(img_size=hw))
    params = ck.convert_spann3r(sd, cfg)

    t = 3
    frames = rng.standard_normal((t, 1, *hw, 3)).astype(np.float32) * 0.5

    views = [{"img": torch.from_numpy(np.transpose(frames[i], (0, 3, 1, 2))),
              "true_shape": torch.tensor([[hw[0], hw[1]]]),
              "instance": [str(i)]} for i in range(t)]
    with torch.no_grad():
        ref_preds, _ = ref.eval().forward(views)

    engine = sp.InferenceEngine(params, cfg, hw, FP32)
    preds = engine.run(frames)

    assert len(preds) == len(ref_preds) == t
    errs = {}

    def _check(name, ours, theirs):
        ours = np.asarray(ours)
        theirs = theirs.numpy()
        errs[name] = float(np.max(np.abs(ours - theirs)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=1e-2)

    _check("pts3d_0", preds[0]["pts3d"], ref_preds[0]["pts3d"])
    for i in range(1, t):
        _check(f"pts3d_in_other_view_{i}", preds[i]["pts3d_in_other_view"],
               ref_preds[i]["pts3d_in_other_view"])
        _check(f"conf_{i}", preds[i]["conf"], ref_preds[i]["conf"])

    # merge this resolution's entry into the shared artifact
    doc = {}
    if osp.exists(PARITY_ARTIFACT):
        with open(PARITY_ARTIFACT) as f:
            doc = json.load(f)
        if "max_abs_error" in doc:  # pre-r5 single-resolution layout
            doc = {"224x224": doc}
    doc[f"{hw[0]}x{hw[1]}"] = {
        "date": datetime.date.today().isoformat(),
        "arch": f"ViT-L/24 enc + dual ViT-B/12 dec + DPT heads @{hw}, "
                "online eval semantics, T=3, FP32",
        "tolerance": {"rtol": 1e-2, "atol": 1e-2},
        "max_abs_error": errs,
        "backend": __import__("jax").default_backend(),
    }
    with open(PARITY_ARTIFACT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")

"""CroCo downstream adapters vs the reference croco_downstream.py."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, ViTConfig
from spann3r_tpu.models import croco_downstream as cd
from spann3r_tpu.models import croco_pretrain as cp
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

HW = (32, 32)


def cfg(rope=100.0):
    return DUSt3RConfig(img_size=HW, patch_size=16,
                        enc=ViTConfig(dim=64, depth=2, num_heads=4,
                                      rope_base=rope),
                        dec=ViTConfig(dim=48, depth=2, num_heads=4,
                                      rope_base=rope))


def test_croco_args_from_ckpt():
    assert cd.croco_args_from_ckpt({"croco_kwargs": {"enc_depth": 24}}) == \
        {"enc_depth": 24}
    ns = argparse.Namespace(model="CroCoNet(enc_embed_dim=1024, enc_depth=24)")
    assert cd.croco_args_from_ckpt({"args": ns}) == \
        {"enc_embed_dim": 1024, "enc_depth": 24}
    assert cd.croco_args_from_ckpt({}) == {}
    with pytest.raises(ValueError):
        cd.croco_args_from_ckpt(
            {"args": argparse.Namespace(model="__import__('os')")})


def test_dpt_hook_indices_match_reference_formula():
    # ref head_downstream.py:40-47
    assert cd.dpt_hook_indices(24, 8) == [24 + 8 - 1 - i * 3
                                          for i in range(3, -1, -1)]
    assert cd.dpt_hook_indices(24, 12) == [24 + 12 - 1 - i * 4
                                           for i in range(3, -1, -1)]
    assert cd.dpt_hook_indices(12) == [12 - 1 - i * 3 for i in range(3, -1, -1)]


def _torch_capture_head():
    import torch

    class CaptureHead(torch.nn.Module):
        return_all_blocks = True

        def setup(self, net):
            pass

        def forward(self, x, img_info):
            return x

    return CaptureHead()


def _params_from(net):
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    p = {
        "patch_embed": {"proj": ck._conv(sd, "patch_embed.proj")},
        "enc_blocks": ck._block_stack(sd, "enc_blocks"),
        "enc_norm": ck._ln(sd, "enc_norm"),
    }
    if any(k.startswith("dec_blocks") for k in sd):
        p["decoder_embed"] = ck._lin(sd, "decoder_embed")
        p["dec_blocks"] = ck._block_stack(sd, "dec_blocks", decoder=True)
        p["dec_norm"] = ck._ln(sd, "dec_norm")
    return p


@requires_reference
@pytest.mark.parametrize("pos_embed", ["RoPE100", "cosine"])
def test_binocular_states_parity(rng, pos_embed):
    import torch
    from models.croco_downstream import CroCoDownstreamBinocular

    torch.manual_seed(0)
    net = CroCoDownstreamBinocular(
        _torch_capture_head(), img_size=HW[0], patch_size=16,
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
        pos_embed=pos_embed).eval()

    img1 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    with torch.no_grad():
        ref_states = net(torch.from_numpy(img1), torch.from_numpy(img2))

    c = cfg(rope=100.0 if pos_embed.startswith("RoPE") else 0.0)
    got = cd.downstream_binocular(
        _params_from(net), jnp.asarray(np.transpose(img1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img2, (0, 2, 3, 1))), c,
        head_fn=lambda states, hw: states, prec=FP32)

    assert len(got) == len(ref_states) == c.enc.depth + c.dec.depth
    for i, (a, r) in enumerate(zip(got, ref_states)):
        np.testing.assert_allclose(np.asarray(a), r.numpy(),
                                   rtol=2e-4, atol=2e-4, err_msg=f"state {i}")


@requires_reference
def test_monocular_states_parity(rng):
    import torch
    from models.croco_downstream import CroCoDownstreamMonocularEncoder

    torch.manual_seed(0)
    net = CroCoDownstreamMonocularEncoder(
        _torch_capture_head(), img_size=HW[0], patch_size=16,
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        pos_embed="RoPE100").eval()

    img = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    with torch.no_grad():
        ref_states = net(torch.from_numpy(img))

    got = cd.downstream_monocular(
        _params_from(net), jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
        cfg(), head_fn=lambda states, hw: states, prec=FP32)
    assert len(got) == len(ref_states)
    for a, r in zip(got, ref_states):
        np.testing.assert_allclose(np.asarray(a), r.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_linear_pixelwise_head_shapes(rng):
    c = cfg()
    params = cp.init_croco(jax.random.PRNGKey(0), c)
    hp, head_fn = cd.linear_pixelwise_head(jax.random.PRNGKey(1), c,
                                           num_channels=2)
    img1 = jnp.asarray(rng.standard_normal((2, *HW, 3)), jnp.float32) * 0.3
    img2 = jnp.asarray(rng.standard_normal((2, *HW, 3)), jnp.float32) * 0.3
    out = cd.downstream_binocular(params, img1, img2, c, head_fn, FP32)
    assert out.shape == (2, *HW, 2)
    assert np.isfinite(np.asarray(out)).all()

"""Encoder/decoder block + patch-embed parity vs reference torch modules.

Reference modules are built with random torch init, their state_dicts pushed
through our converter, and outputs compared — this validates both the math
and the checkpoint mapping in one shot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import ViTConfig
from spann3r_tpu.models import vit
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

CFG = ViTConfig(dim=64, depth=2, num_heads=4)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


@requires_reference
def test_block_parity(rng):
    import torch
    from models.blocks import Block
    from models.pos_embed import RoPE2D

    torch.manual_seed(0)
    blk = Block(CFG.dim, CFG.num_heads, qkv_bias=True, rope=RoPE2D(freq=100.0)).eval()
    x = rng.standard_normal((2, 10, CFG.dim)).astype(np.float32)
    pos = rng.integers(0, 7, size=(2, 10, 2)).astype(np.int64)
    with torch.no_grad():
        ref = blk(torch.from_numpy(x), torch.from_numpy(pos)).numpy()

    sd = _sd(blk)
    params = {
        "norm1": ck._ln(sd, "norm1"),
        "attn": {"qkv": ck._lin(sd, "attn.qkv"), "proj": ck._lin(sd, "attn.proj")},
        "norm2": ck._ln(sd, "norm2"),
        "mlp": {"fc1": ck._lin(sd, "mlp.fc1"), "fc2": ck._lin(sd, "mlp.fc2")},
    }
    ours = vit.block_apply(params, jnp.asarray(x), jnp.asarray(pos), CFG)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


@requires_reference
def test_decoder_block_parity(rng):
    import torch
    from models.blocks import DecoderBlock
    from models.pos_embed import RoPE2D

    torch.manual_seed(1)
    blk = DecoderBlock(CFG.dim, CFG.num_heads, qkv_bias=True, norm_mem=True,
                       rope=RoPE2D(freq=100.0)).eval()
    x = rng.standard_normal((2, 10, CFG.dim)).astype(np.float32)
    y = rng.standard_normal((2, 12, CFG.dim)).astype(np.float32)
    xpos = rng.integers(0, 7, size=(2, 10, 2)).astype(np.int64)
    ypos = rng.integers(0, 7, size=(2, 12, 2)).astype(np.int64)
    with torch.no_grad():
        ref, _ = blk(torch.from_numpy(x), torch.from_numpy(y),
                     torch.from_numpy(xpos), torch.from_numpy(ypos))

    sd = _sd(blk)
    params = {
        "norm1": ck._ln(sd, "norm1"),
        "attn": {"qkv": ck._lin(sd, "attn.qkv"), "proj": ck._lin(sd, "attn.proj")},
        "norm2": ck._ln(sd, "norm2"),
        "cross_attn": {"projq": ck._lin(sd, "cross_attn.projq"),
                       "projk": ck._lin(sd, "cross_attn.projk"),
                       "projv": ck._lin(sd, "cross_attn.projv"),
                       "proj": ck._lin(sd, "cross_attn.proj")},
        "norm3": ck._ln(sd, "norm3"),
        "norm_y": ck._ln(sd, "norm_y"),
        "mlp": {"fc1": ck._lin(sd, "mlp.fc1"), "fc2": ck._lin(sd, "mlp.fc2")},
    }
    ours = vit.decoder_block_apply(params, jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(xpos), jnp.asarray(ypos), CFG)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-4)


@requires_reference
def test_patch_embed_parity(rng):
    import torch
    from dust3r.patch_embed import PatchEmbedDust3R

    torch.manual_seed(2)
    pe = PatchEmbedDust3R(img_size=(224, 224), patch_size=16, in_chans=3,
                          embed_dim=96).eval()
    img = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_x, ref_pos = pe(torch.from_numpy(img))

    sd = _sd(pe)
    params = {"proj": ck._conv(sd, "proj")}
    img_nhwc = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    x, pos = vit.patch_embed_apply(params, img_nhwc, 16)
    np.testing.assert_allclose(np.asarray(x), ref_x.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(pos), ref_pos.numpy())


@requires_reference
def test_deconv_parity(rng):
    """ConvTranspose2d conversion numerics (k=s, the DPT reassembly case)."""
    import torch

    torch.manual_seed(3)
    for k in (2, 4):
        tconv = torch.nn.ConvTranspose2d(6, 5, kernel_size=k, stride=k).eval()
        x = rng.standard_normal((2, 6, 8, 10)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()
        sd = {"d." + k2: v.detach().numpy() for k2, v in tconv.state_dict().items()}
        params = ck._deconv(sd, "d")
        from spann3r_tpu.ops.layers import conv2d_transpose
        ours = conv2d_transpose(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), stride=k)
        np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                                   ref, rtol=1e-4, atol=1e-5)


@requires_reference
def test_interpolate_align_corners(rng):
    import torch
    import torch.nn.functional as F
    from spann3r_tpu.ops.layers import interpolate_bilinear

    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.interpolate(xt, scale_factor=2, mode="bilinear", align_corners=True).numpy()
    ours = interpolate_bilinear(jnp.asarray(x), (14, 18), align_corners=True)
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               ref, rtol=1e-5, atol=1e-5)

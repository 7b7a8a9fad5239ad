"""Pixelwise DPT task head vs reference PixelwiseTaskWithDPT
(croco/models/head_downstream.py + dpt_block.py)."""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, ViTConfig
from spann3r_tpu.models import croco_downstream as cd
from spann3r_tpu.stereoflow import head as sfh
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference
from .test_croco_pretrain import _convert_croco

HW = (32, 32)


def cfg(rope=100.0):
    return DUSt3RConfig(img_size=HW, patch_size=16,
                        enc=ViTConfig(dim=64, depth=2, num_heads=4,
                                      rope_base=rope),
                        dec=ViTConfig(dim=48, depth=2, num_heads=4,
                                      rope_base=rope))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@requires_reference
@pytest.mark.parametrize("num_channels", [2, 3])
def test_pixelwise_dpt_adapter_parity(rng, num_channels):
    """Adapter-level: random hook states through the reference
    PixelwiseTaskWithDPT vs pixelwise_dpt_apply with converted weights."""
    import torch
    from models.head_downstream import PixelwiseTaskWithDPT

    torch.manual_seed(0)
    c = cfg()
    hooks = [0, 1, 2, 3]
    layer_dims = [16, 24, 32, 48]
    head = PixelwiseTaskWithDPT(hooks_idx=hooks, layer_dims=layer_dims,
                                feature_dim=32, last_dim=16,
                                num_channels=num_channels)
    head.num_channels = num_channels
    croconet = SimpleNamespace(enc_depth=2, dec_depth=2, enc_embed_dim=64,
                               dec_embed_dim=48, dec_blocks=True)
    head.setup(croconet)
    head.eval()

    n = (HW[0] // 16) * (HW[1] // 16)
    states = [rng.standard_normal((2, n, 64 if h < 2 else 48))
              .astype(np.float32) for h in hooks]
    with torch.no_grad():
        want = head([torch.from_numpy(s) for s in states],
                    {"height": HW[0], "width": HW[1]})

    sd = {k: v.detach().numpy() for k, v in head.state_dict().items()}
    p = ck._dpt_head(sd, "dpt")
    got = sfh.pixelwise_dpt_apply(p, [jnp.asarray(s) for s in states], HW,
                                  hooks, patch_size=16)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want.numpy(), rtol=2e-4, atol=2e-4)


@requires_reference
def test_binocular_with_dpt_head_full_parity(rng):
    """End-to-end: CroCoDownstreamBinocular + PixelwiseTaskWithDPT vs
    downstream_binocular + init_pixelwise_dpt with converted weights
    (the exact model stereoflow/train.py:116-124 builds)."""
    import torch
    from models.croco import CroCoNet  # noqa: F401  (registers path)
    from models.croco_downstream import CroCoDownstreamBinocular
    from models.head_downstream import PixelwiseTaskWithDPT

    torch.manual_seed(0)
    num_channels = 3  # flow + conf
    head = PixelwiseTaskWithDPT(hooks_idx=[0, 1, 2, 3],
                                layer_dims=[16, 24, 32, 48],
                                feature_dim=32, last_dim=16,
                                num_channels=num_channels)
    head.num_channels = num_channels
    net = CroCoDownstreamBinocular(
        head, img_size=HW[0], patch_size=16, enc_embed_dim=64, enc_depth=2,
        enc_num_heads=4, dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
        pos_embed="RoPE100").eval()

    img1 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(img1), torch.from_numpy(img2))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    sd["mask_token"] = np.zeros((1, 1, 48), np.float32)  # unused here
    sd["prediction_head.weight"] = np.zeros((1, 48), np.float32)
    sd["prediction_head.bias"] = np.zeros((1,), np.float32)
    croco_params = _convert_croco(sd)
    head_p = ck._dpt_head({k[len("head."):]: v for k, v in sd.items()
                           if k.startswith("head.")}, "dpt")

    c = cfg()

    def head_fn(states, img_hw):
        return sfh.pixelwise_dpt_apply(head_p, states, img_hw, [0, 1, 2, 3],
                                       patch_size=16)

    got = cd.downstream_binocular(
        croco_params, jnp.asarray(np.transpose(img1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img2, (0, 2, 3, 1))), c, head_fn, prec=FP32)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want.numpy(), rtol=3e-4, atol=3e-4)


def test_init_pixelwise_dpt_default_hooks_and_shapes(rng):
    """Random init runs and respects the automatic hook placement for a
    dec_depth in the reference's {8,12,24} table."""
    c = DUSt3RConfig(img_size=HW, patch_size=16,
                     enc=ViTConfig(dim=32, depth=4, num_heads=4,
                                   rope_base=100.0),
                     dec=ViTConfig(dim=24, depth=8, num_heads=4,
                                   rope_base=100.0))
    p, hooks = sfh.init_pixelwise_dpt(jax.random.PRNGKey(0), c,
                                      num_channels=2,
                                      layer_dims=(8, 12, 16, 24),
                                      feature_dim=16, last_dim=8)
    assert hooks == [4 + 8 - 1 - i * 3 for i in range(3, -1, -1)]
    n = (HW[0] // 16) * (HW[1] // 16)
    states = [jnp.asarray(rng.standard_normal((1, n, 32 if i < 4 else 24))
                          .astype(np.float32)) for i in range(12)]
    out = sfh.pixelwise_dpt_apply(p, states, HW, hooks, patch_size=16)
    assert out.shape == (1, *HW, 2)
    assert np.isfinite(np.asarray(out)).all()

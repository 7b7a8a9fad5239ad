"""Full two-view DUSt3R forward parity vs the reference torch model
(random weights pushed through the checkpoint converter)."""
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, ViTConfig, FP32
from spann3r_tpu.models import dust3r as d3
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference


def small_cfg(head_type: str) -> DUSt3RConfig:
    return DUSt3RConfig(
        img_size=(64, 96), patch_size=16,
        enc=ViTConfig(dim=64, depth=3, num_heads=4),
        dec=ViTConfig(dim=48, depth=12, num_heads=4),
        head_type=head_type,
    )


def build_reference(head_type: str):
    import torch
    from dust3r.model import AsymmetricCroCo3DStereo

    torch.manual_seed(0)
    net = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type=head_type,
        depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")),
        img_size=(64, 96), patch_size=16,
        enc_embed_dim=64, enc_depth=3, enc_num_heads=4,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=4,
        pos_embed="RoPE100", landscape_only=False,
        patch_embed_cls="PatchEmbedDust3R",
    ).eval()
    return net


@requires_reference
@pytest.mark.parametrize("head_type", ["linear", "dpt"])
def test_two_view_forward_parity(rng, head_type):
    import torch

    net = build_reference(head_type)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    cfg = small_cfg(head_type)
    params = ck.convert_dust3r(sd, cfg)

    img1 = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, 64, 96)).astype(np.float32)
    shape = torch.tensor([[64, 96], [64, 96]])
    view1 = {"img": torch.from_numpy(img1), "true_shape": shape,
             "instance": ["0", "1"]}
    view2 = {"img": torch.from_numpy(img2), "true_shape": shape,
             "instance": ["2", "3"]}
    with torch.no_grad():
        ref1, ref2 = net(view1, view2)

    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    res1, res2 = d3.forward(params, j1, j2, cfg, FP32)

    np.testing.assert_allclose(np.asarray(res1["pts3d"]), ref1["pts3d"].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res1["conf"]), ref1["conf"].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res2["pts3d_in_other_view"]),
                               ref2["pts3d_in_other_view"].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res2["conf"]), ref2["conf"].numpy(),
                               rtol=1e-3, atol=1e-4)


def test_forward_jits_and_bf16_runs(rng):
    """bf16 path compiles and produces finite outputs (no reference needed)."""
    import jax
    cfg = small_cfg("linear")
    params = d3.init_dust3r(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32))
    fwd = jax.jit(lambda p, a, b: d3.forward(p, a, b, cfg))
    r1, r2 = fwd(params, img, img)
    assert r1["pts3d"].shape == (1, 64, 96, 3)
    assert bool(jnp.isfinite(r1["pts3d"]).all())
    assert bool(jnp.isfinite(r2["pts3d_in_other_view"]).all())

"""CroCo masked cross-view completion parity vs the reference CroCoNet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, ViTConfig
from spann3r_tpu.models import croco_pretrain as cp
from spann3r_tpu.utils import torch_ckpt as ck

from .conftest import requires_reference

HW = (32, 32)  # reference patchify asserts square inputs
MASK_RATIO = 0.75


def cfg(rope: float = 100.0):
    return DUSt3RConfig(img_size=HW, patch_size=16,
                        enc=ViTConfig(dim=64, depth=2, num_heads=4,
                                      rope_base=rope),
                        dec=ViTConfig(dim=48, depth=2, num_heads=4,
                                      rope_base=rope))


def _convert_croco(sd):
    return {
        "patch_embed": {"proj": ck._conv(sd, "patch_embed.proj")},
        "enc_blocks": ck._block_stack(sd, "enc_blocks"),
        "enc_norm": ck._ln(sd, "enc_norm"),
        "decoder_embed": ck._lin(sd, "decoder_embed"),
        "dec_blocks": ck._block_stack(sd, "dec_blocks", decoder=True),
        "dec_norm": ck._ln(sd, "dec_norm"),
        "mask_token": jnp.asarray(sd["mask_token"]),
        "prediction_head": ck._lin(sd, "prediction_head"),
    }


@requires_reference
@pytest.mark.parametrize("pos_embed", ["RoPE100", "cosine"])
def test_croco_pretrain_parity(rng, pos_embed):
    import torch
    from models.croco import CroCoNet

    torch.manual_seed(0)
    net = CroCoNet(img_size=HW[1], patch_size=16, mask_ratio=MASK_RATIO,
                   enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
                   dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
                   pos_embed=pos_embed).eval()
    # PatchEmbed asserts square img_size; swap in the flexible variant
    from dust3r.patch_embed import PatchEmbedDust3R
    pe = PatchEmbedDust3R(HW, 16, 3, 64)
    pe.load_state_dict(net.patch_embed.state_dict())
    net.patch_embed = pe

    n = (HW[0] // 16) * (HW[1] // 16)
    mask_np = cp.random_mask(jax.random.PRNGKey(1), 2, n, MASK_RATIO)
    mask_np = np.asarray(mask_np)
    class FixedMask(torch.nn.Module):
        def forward(self, x):
            return torch.from_numpy(mask_np)

    net.mask_generator = FixedMask()

    img1 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    img2 = rng.standard_normal((2, 3, *HW)).astype(np.float32)
    with torch.no_grad():
        ref_pred, ref_mask, ref_target = net(torch.from_numpy(img1),
                                             torch.from_numpy(img2))

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = _convert_croco(sd)
    c = cfg(rope=100.0 if pos_embed.startswith("RoPE") else 0.0)
    pred, mask, target = cp.croco_forward(
        params, jnp.asarray(np.transpose(img1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img2, (0, 2, 3, 1))),
        jnp.asarray(mask_np), c, mask_ratio=MASK_RATIO, prec=FP32)

    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    np.testing.assert_allclose(np.asarray(target), ref_target.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(),
                               rtol=2e-4, atol=2e-4)

    # MaskedMSE parity
    from models.criterion import MaskedMSE
    ref_loss = MaskedMSE()(ref_pred, ref_mask, ref_target)
    loss = cp.masked_mse(pred, mask, target)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


def test_random_mask_exact_count():
    m = cp.random_mask(jax.random.PRNGKey(0), 4, 100, 0.9)
    counts = np.asarray(jnp.sum(m, axis=1))
    np.testing.assert_array_equal(counts, 90)


def test_croco_pretrain_trains(rng):
    """Masked loss is differentiable and decreases on one batch."""
    import optax

    c = cfg()
    params = cp.init_croco(jax.random.PRNGKey(0), c)
    img1 = jnp.asarray(rng.standard_normal((2, *HW, 3)).astype(np.float32) * 0.3)
    img2 = jnp.asarray(rng.standard_normal((2, *HW, 3)).astype(np.float32) * 0.3)
    n = (HW[0] // 16) * (HW[1] // 16)
    mask = cp.random_mask(jax.random.PRNGKey(1), 2, n, MASK_RATIO)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            pred, m, target = cp.croco_forward(p, img1, img2, mask, c,
                                               mask_ratio=MASK_RATIO,
                                               prec=FP32)
            return cp.masked_mse(pred, m, target)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(10):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

"""Pairwise inference API + gradient-accumulation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.config import DUSt3RConfig, FP32, Spann3RConfig, ViTConfig
from spann3r_tpu.models import dust3r as d3
from spann3r_tpu.models import spann3r as sp
from spann3r_tpu.models.inference import inference
from spann3r_tpu.models.pairs import make_pairs

HW = (32, 32)


def small_d3():
    return DUSt3RConfig(img_size=HW, patch_size=16,
                        enc=ViTConfig(dim=64, depth=2, num_heads=4),
                        dec=ViTConfig(dim=48, depth=12, num_heads=4),
                        head_type="linear")


def test_inference_pairs_contract(rng):
    cfg = small_d3()
    params = d3.init_dust3r(jax.random.PRNGKey(0), cfg)
    n = 4
    views = [{"img": rng.standard_normal((1, *HW, 3)).astype(np.float32),
              "idx": i} for i in range(n)]
    pairs = [(views[a], views[b])
             for a, b in make_pairs(n, "complete", symmetrize=True)]
    out = inference(pairs, params, cfg, batch_size=5, prec=FP32,
                    verbose=False)
    n_pairs = len(pairs)
    assert out["pred1"]["pts3d"].shape == (n_pairs, *HW, 3)
    assert out["pred2"]["pts3d_in_other_view"].shape == (n_pairs, *HW, 3)
    assert len(out["view1"]["idx"]) == n_pairs
    assert np.isfinite(out["pred1"]["pts3d"]).all()
    # deterministic across different batch partitions
    out2 = inference(pairs, params, cfg, batch_size=3, prec=FP32,
                     verbose=False)
    np.testing.assert_allclose(out["pred1"]["pts3d"], out2["pred1"]["pts3d"],
                               rtol=1e-5, atol=1e-5)


def test_grad_accumulation_matches_big_batch(rng):
    """accum_iter=2 over half-batches == single step over the full batch."""
    from spann3r_tpu import training as tr

    cfg = Spann3RConfig(
        dust3r=small_d3(), value_enc_depth=2, value_enc_dim=64,
        value_enc_heads=4, attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    opt = tr.make_optimizer(0.0)

    t, b = 3, 4
    batch = {
        "img": rng.standard_normal((t, b, *HW, 3)).astype(np.float32) * 0.3,
        "pts3d": rng.standard_normal((t, b, *HW, 3)).astype(np.float32) + 2,
        "valid_mask": np.ones((t, b, *HW), bool),
        "camera_pose": np.broadcast_to(np.eye(4, dtype=np.float32),
                                       (t, b, 4, 4)).copy(),
    }
    halves = [{k: v[:, :2] for k, v in batch.items()},
              {k: v[:, 2:] for k, v in batch.items()}]

    # accumulate over the two halves
    _, grad_step, apply_step = tr.make_accum_train_step(cfg, FP32, opt, 2,
                                                        remat=False)
    grad_acc = jax.tree.map(jnp.zeros_like, params)
    for h in halves:
        grad_acc, _ = grad_step(params, grad_acc,
                                {k: jnp.asarray(v) for k, v in h.items()},
                                None, jnp.float32(0.4))

    # direct grads on the full batch (loss is mean-per-sample so halves avg)
    step = tr.make_train_step(cfg, FP32, opt, remat=False)
    opt_state = opt.init(params)
    p2, _, _ = step(jax.tree.map(jnp.array, params), opt_state,
                    {k: jnp.asarray(v) for k, v in batch.items()},
                    None, jnp.float32(1e-3), jnp.float32(0.4))

    # apply the accumulated grads with the same lr; compare updated params
    opt_state2 = opt.init(params)
    p1, _, _, _ = apply_step(jax.tree.map(jnp.array, params), opt_state2,
                             grad_acc, jnp.float32(1e-3))
    # Adam normalizes magnitudes, so compare update DIRECTIONS on a leaf
    d1 = np.asarray(p1["attn_head_1"]["fc1"]["w"]) - np.asarray(
        params["attn_head_1"]["fc1"]["w"])
    d2 = np.asarray(p2["attn_head_1"]["fc1"]["w"]) - np.asarray(
        params["attn_head_1"]["fc1"]["w"])
    cos = (d1 * d2).sum() / (np.linalg.norm(d1) * np.linalg.norm(d2))
    assert cos > 0.95

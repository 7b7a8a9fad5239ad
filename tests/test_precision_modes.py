"""BF16_FAST (bf16 heads) serving mode stays within tolerance of BF16.

BF16 keeps the DPT/linear heads in fp32 (the reference's AMP policy,
dust3r/model.py:220); BF16_FAST additionally runs the heads in bf16 for
serving speed. This pins the accuracy delta so the serving mode cannot
silently drift (VERDICT r1 item #7).
"""
import jax
import jax.numpy as jnp
import numpy as np

from spann3r_tpu.config import (BF16, BF16_FAST, DUSt3RConfig, MemoryConfig,
                                Spann3RConfig, ViTConfig)
from spann3r_tpu.models import spann3r as sp

HW = (64, 64)
T = 6


def tiny_cfg() -> Spann3RConfig:
    return Spann3RConfig(
        dust3r=DUSt3RConfig(
            img_size=HW, patch_size=16,
            enc=ViTConfig(dim=128, depth=2, num_heads=4),
            dec=ViTConfig(dim=96, depth=2, num_heads=4),
            head_type="dpt",
            dpt_feature_dim=32, dpt_last_dim=16,
            dpt_layer_dims=(16, 24, 32, 48),
        ),
        memory=MemoryConfig(long_mem_size=64, work_mem_size=2),
        value_enc_depth=1, value_enc_dim=128, value_enc_heads=4,
        attn_head_in=128 + 96, attn_head_out=128,
    )


def _run(params, cfg, frames, prec):
    carry = sp.init_video_carry(cfg, HW, 1, prec)
    valid = jnp.ones(T, bool)
    _, ys = jax.jit(
        lambda p, c, im, v: sp.scan_video_chunk(p, cfg, c, im, v, HW, prec)
    )(params, carry, frames, valid)
    return (np.asarray(ys["pts3d"], np.float32),
            np.asarray(ys["conf"], np.float32),
            np.asarray(ys["emitted"]))


def test_bf16_fast_matches_bf16():
    cfg = tiny_cfg()
    params = sp.init_spann3r(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(
        rng.integers(0, 256, (T, 1, *HW, 3)).astype(np.uint8))

    pts_ref, conf_ref, em_ref = _run(params, cfg, frames, BF16)
    pts_fast, conf_fast, em_fast = _run(params, cfg, frames, BF16_FAST)

    np.testing.assert_array_equal(em_ref, em_fast)
    em = em_ref.astype(bool)
    assert em.any()

    # pointmaps: bf16 heads carry ~8 mantissa bits (1 ulp = 2^-8 ~ 0.4%
    # relative), so a few ulps of drift through the conv cascade is the
    # expected signal — and it must be PRESENT: rel == 0 everywhere would
    # mean head_dtype silently stopped reaching the head (the r4 regression
    # this test now guards: heads.py force-cast the states back to fp32,
    # making BF16_FAST a no-op)
    scale = np.abs(pts_ref[em]).mean() + 1e-6
    rel = np.abs(pts_fast[em] - pts_ref[em]) / scale
    assert rel.max() > 0.0, "BF16_FAST output identical to BF16 — bf16 " \
                            "heads are not actually running in bf16"
    assert np.median(rel) < 2e-2, np.median(rel)
    assert np.quantile(rel, 0.99) < 1e-1, np.quantile(rel, 0.99)

    # confidence: same sparsification behavior at the demo threshold
    rel_c = np.abs(conf_fast[em] - conf_ref[em]) / (np.abs(conf_ref[em]) + 1e-6)
    assert np.median(rel_c) < 5e-3, np.median(rel_c)
    agree = ((conf_fast[em] > 1.001) == (conf_ref[em] > 1.001)).mean()
    assert agree > 0.98, agree

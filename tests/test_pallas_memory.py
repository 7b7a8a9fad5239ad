"""Fused memory-read kernel vs the masked-softmax reference path
(interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.models import memory as M
from spann3r_tpu.ops import pallas_memory
from spann3r_tpu.ops.layers import init_layer_norm

D, P, C = 64, 16, 256  # C % block_c == 0 with block_c=128


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pallas_memory.pl.pallas_call
    monkeypatch.setattr(pallas_memory.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _norms():
    return {"norm_q": init_layer_norm(D), "norm_k": init_layer_norm(D),
            "norm_v": init_layer_norm(D)}


def _filled_state(rng, n_frames=5, p=8):
    state = M.init_memory(1, C, D, dtype=jnp.float32)
    for t in range(n_frames):
        kf = jnp.asarray(rng.standard_normal((1, p, D)).astype(np.float32))
        state = M.add_mem(state, kf, kf * 0.5)
    return state


@pytest.mark.parametrize("attn_thresh", [0.0, 5e-4, 0.05])
def test_kernel_matches_reference_path(rng, attn_thresh):
    norms = _norms()
    state = _filled_state(rng)
    q = jnp.asarray(rng.standard_normal((1, P, D)).astype(np.float32))

    ref_out, ref_state = M.memory_read(norms, state, q,
                                       attn_thresh=attn_thresh)

    from spann3r_tpu.ops.layers import layer_norm
    qn = layer_norm(norms["norm_q"], q)
    kn = layer_norm(norms["norm_k"], state.k)
    vn = layer_norm(norms["norm_v"], state.v)
    out, asum = pallas_memory.memory_read_attention(
        qn, kn, vn, state.size[0], attn_thresh, block_c=128)
    out = out + q  # residual handled by the caller

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(asum)[0],
                               np.asarray(ref_state.attn - state.attn)[0],
                               rtol=2e-5, atol=2e-5)


def test_kernel_respects_validity_mask(rng):
    """Slots beyond `size` must receive zero attention."""
    norms = _norms()
    state = _filled_state(rng, n_frames=2, p=8)  # size = 16 of 256
    q = jnp.asarray(rng.standard_normal((1, P, D)).astype(np.float32))
    from spann3r_tpu.ops.layers import layer_norm
    qn = layer_norm(norms["norm_q"], q)
    kn = layer_norm(norms["norm_k"], state.k)
    vn = layer_norm(norms["norm_v"], state.v)
    _, asum = pallas_memory.memory_read_attention(qn, kn, vn, state.size[0],
                                                  0.0, block_c=128)
    asum = np.asarray(asum)[0]
    assert np.all(asum[int(state.size[0]):] == 0)
    np.testing.assert_allclose(asum[:int(state.size[0])].sum(), P, rtol=1e-4)


def test_kernel_inside_video_scan(rng, monkeypatch):
    """Chunked video scan with the kernel enabled == kernel disabled."""
    import jax
    from spann3r_tpu.config import (DUSt3RConfig, FP32, Spann3RConfig,
                                    ViTConfig)
    from spann3r_tpu.models import spann3r as sp

    cfg = Spann3RConfig(
        dust3r=DUSt3RConfig(img_size=(32, 32), patch_size=16,
                            enc=ViTConfig(dim=64, depth=2, num_heads=4),
                            dec=ViTConfig(dim=48, depth=12, num_heads=4),
                            head_type="linear"),
        value_enc_depth=2, value_enc_dim=64, value_enc_heads=4,
        attn_head_in=64 + 48, attn_head_out=64)
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    frames = rng.standard_normal((4, 1, 32, 32, 3)).astype(np.float32) * 0.3

    monkeypatch.setenv("SPANN3R_PALLAS_MEMREAD", "1")
    engine = sp.InferenceEngine(params, cfg, (32, 32), FP32)
    preds_pl = engine.run_video(frames, chunk=2)
    monkeypatch.delenv("SPANN3R_PALLAS_MEMREAD")
    engine2 = sp.InferenceEngine(params, cfg, (32, 32), FP32)
    preds_ref = engine2.run_video(frames, chunk=2)
    for a, b in zip(preds_pl, preds_ref):
        for k in a:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=5e-4, atol=5e-4)


def test_env_flag_dispatch(rng, monkeypatch):
    """memory_read routes through the kernel when the env flag is set."""
    monkeypatch.setenv("SPANN3R_PALLAS_MEMREAD", "1")
    norms = _norms()
    state = _filled_state(rng)
    q = jnp.asarray(rng.standard_normal((1, P, D)).astype(np.float32))
    out_pl, st_pl = M.memory_read(norms, state, q, attn_thresh=5e-4)
    monkeypatch.delenv("SPANN3R_PALLAS_MEMREAD")
    out_ref, st_ref = M.memory_read(norms, state, q, attn_thresh=5e-4)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_pl.attn), np.asarray(st_ref.attn),
                               rtol=2e-5, atol=2e-5)


def test_kernel_is_tpu_default(monkeypatch):
    """Product serving (demo/eval/app) and bench share one configuration:
    the kernel dispatches by default on TPU, never on CPU, and the env var
    is a two-way override (VERDICT r4 #1)."""
    monkeypatch.delenv("SPANN3R_PALLAS_MEMREAD", raising=False)
    assert not M._use_pallas_memread()  # tests run on CPU

    monkeypatch.setattr(M.jax, "default_backend", lambda: "tpu")
    assert M._use_pallas_memread()
    monkeypatch.setenv("SPANN3R_PALLAS_MEMREAD", "0")
    assert not M._use_pallas_memread()

    monkeypatch.setattr(M.jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("SPANN3R_PALLAS_MEMREAD", "1")
    assert M._use_pallas_memread()

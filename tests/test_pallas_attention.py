"""Fused SDPA kernel vs the jnp attention path (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.ops import pallas_attention as PA


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = PA.pl.pallas_call
    monkeypatch.setattr(PA.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


@pytest.mark.parametrize("b,h,n,m,d", [
    (1, 4, 196, 196, 64),   # 224-res self-attention shape
    (2, 3, 48, 96, 32),     # cross-attention, kv longer than q
])
def test_kernel_matches_jnp(rng, b, h, n, m, d):
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    scale = d ** -0.5
    ref = PA._sdpa_jnp(q, k, v, scale)
    out = PA.fused_sdpa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_matches_jnp(rng):
    b, h, n, d = 1, 2, 64, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d))).astype(jnp.bfloat16)
    ref = PA._sdpa_jnp(q, k, v, d ** -0.5)
    out = PA.fused_sdpa(q, k, v, d ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_grad_falls_back_to_jnp(rng):
    """custom_vjp backward == grad of the jnp path (kernel stays safe
    under jax.grad even though training never enables it)."""
    b, h, n, d = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    scale = d ** -0.5

    g_fused = jax.grad(lambda a, b_, c: jnp.sum(
        PA.fused_sdpa(a, b_, c, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda a, b_, c: jnp.sum(
        PA._sdpa_jnp(a, b_, c, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_attention_env_gate(rng, monkeypatch):
    """self_attention output identical with the gate on (interpret)."""
    from spann3r_tpu.ops import attention as A
    p = A.init_self_attention(jax.random.PRNGKey(0), 32)
    x = jnp.asarray(rng.standard_normal((1, 24, 32)).astype(np.float32))
    ref = A.self_attention(p, x, None, num_heads=4)
    monkeypatch.setenv("SPANN3R_PALLAS_ATTN", "1")
    out = A.self_attention(p, x, None, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

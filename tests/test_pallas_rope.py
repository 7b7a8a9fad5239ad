"""Pallas RoPE2D kernel vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.ops import pallas_rope
from spann3r_tpu.ops.rope import rope_2d_ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run the TPU kernel through the Pallas interpreter on CPU."""
    import functools
    orig = pallas_rope.pl.pallas_call
    monkeypatch.setattr(pallas_rope.pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def test_pallas_rope_matches_reference(rng):
    b, h, n, d = 2, 4, 24, 64
    tok = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 14, (b, n, 2)).astype(np.int32))
    ref = rope_2d_ref(tok, pos, 100.0)
    out = pallas_rope.rope_2d_pallas(tok, pos, 100.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_rope_grad_matches(rng):
    b, h, n, d = 1, 2, 12, 32
    tok = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, 7, (b, n, 2)).astype(np.int32))
    g1 = jax.grad(lambda t: jnp.sum(jnp.sin(
        pallas_rope.rope_2d_pallas(t, pos, 100.0))))(tok)
    g2 = jax.grad(lambda t: jnp.sum(jnp.sin(rope_2d_ref(t, pos, 100.0))))(tok)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)

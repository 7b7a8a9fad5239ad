"""RoPE2D parity vs the reference torch implementation + gradient identity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spann3r_tpu.ops.rope import rope_2d

from .conftest import requires_reference


def _random_inputs(rng, b=2, h=4, n=12, d=64, max_pos=14):
    tokens = rng.standard_normal((b, h, n, d)).astype(np.float32)
    pos = rng.integers(0, max_pos, size=(b, n, 2)).astype(np.int64)
    return tokens, pos


@requires_reference
def test_rope_matches_reference_torch(rng):
    import torch
    from models.pos_embed import RoPE2D  # reference fallback implementation

    tokens, pos = _random_inputs(rng)
    ref = RoPE2D(freq=100.0)(torch.from_numpy(tokens), torch.from_numpy(pos))
    ours = rope_2d(jnp.asarray(tokens), jnp.asarray(pos), 100.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_rope_inverse_is_negated_angle(rng):
    """backward = forward with negated angle => rope(rope(x)) with -pos-trick
    restores x; check via vjp: <rope(x), g> grads equal inverse-rotated g."""
    tokens, pos = _random_inputs(rng)
    x = jnp.asarray(tokens)
    p = jnp.asarray(pos)
    g = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape).astype(np.float32))
    _, vjp = jax.vjp(lambda t: rope_2d(t, p, 100.0), x)
    (dx,) = vjp(g)
    # rotation preserves inner products: <rope(x), g> == <x, rope^-1(g)> == <x, dx>
    y = rope_2d(x, p, 100.0)
    # both inner products are near-zero sums of ~16k cancelling f32 terms;
    # compare in f64 with a norm-scaled atol (a raw rtol flips with XLA/
    # oneDNN reduction-order variance under suite load)
    a = np.vdot(np.asarray(y, np.float64), np.asarray(g, np.float64))
    bb = np.vdot(np.asarray(x, np.float64), np.asarray(dx, np.float64))
    scale = float(np.linalg.norm(np.asarray(y)) * np.linalg.norm(np.asarray(g)))
    assert abs(a - bb) < 1e-5 * scale, (a, bb, scale)
    # and dx has the same norm as g (orthogonality)
    np.testing.assert_allclose(float(jnp.linalg.norm(dx)), float(jnp.linalg.norm(g)), rtol=1e-5)


def test_rope_zero_pos_is_identity(rng):
    tokens, _ = _random_inputs(rng)
    x = jnp.asarray(tokens)
    pos = jnp.zeros((x.shape[0], x.shape[2], 2), jnp.int32)
    np.testing.assert_allclose(np.asarray(rope_2d(x, pos)), tokens, rtol=1e-6)

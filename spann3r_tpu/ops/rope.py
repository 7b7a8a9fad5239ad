"""2D rotary position embedding (RoPE2D) for TPU.

Math matches the reference CUDA kernel layout
(/root/reference/croco/models/curope/kernels.cu:39-50): the head dim D is
split into quarters [u_Y | v_Y | u_X | v_X] (Q = D/4 each).  For the Y pair
(u_Y, v_Y) with angle a_y = pos_y * base^(-i/Q):

    u' = u*cos(a) - v*sin(a)
    v' = v*cos(a) + u*sin(a)

and likewise for the X pair with pos_x.  The torch fallback
(croco/models/pos_embed.py:112-159) computes the identical transform via a
half-split + rotate-half; both derivations agree, which our tests verify
against the reference implementation directly.

The backward pass is the forward rotation with negated angle (rotation
inverse), mirroring curope2d.py:24-29 — no activations need to be stored.

TPU notes: this is a pure VPU elementwise op; the cos/sin tables depend only
on integer patch positions so XLA fuses the whole thing into neighbouring
matmuls.  A Pallas variant exists in ops/pallas_rope.py for the fused
attention path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rope_angles(pos: jax.Array, quarter: int, base: float, dtype) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """cos/sin tables for y and x positions.

    pos: (B, N, 2) int32 (y, x) patch coordinates.
    Returns cos_y, sin_y, cos_x, sin_x each (B, N, Q) in `dtype`.
    """
    inv_freq = (1.0 / (base ** (jnp.arange(quarter, dtype=jnp.float32) / quarter)))
    ang_y = pos[..., 0].astype(jnp.float32)[..., None] * inv_freq  # (B, N, Q)
    ang_x = pos[..., 1].astype(jnp.float32)[..., None] * inv_freq
    return (jnp.cos(ang_y).astype(dtype), jnp.sin(ang_y).astype(dtype),
            jnp.cos(ang_x).astype(dtype), jnp.sin(ang_x).astype(dtype))


def _apply(tokens: jax.Array, pos: jax.Array, base: float, sign: float) -> jax.Array:
    """tokens: (B, H, N, D) — heads-major layout; pos: (B, N, 2)."""
    D = tokens.shape[-1]
    assert D % 4 == 0, f"head dim {D} must be a multiple of 4"
    Q = D // 4
    cos_y, sin_y, cos_x, sin_x = _rope_angles(pos, Q, base, tokens.dtype)
    # broadcast over the heads axis: (B, 1, N, Q)
    cos_y, sin_y = cos_y[:, None], sin_y[:, None]
    cos_x, sin_x = cos_x[:, None], sin_x[:, None]
    if sign < 0:
        sin_y, sin_x = -sin_y, -sin_x

    u_y = tokens[..., 0 * Q:1 * Q]
    v_y = tokens[..., 1 * Q:2 * Q]
    u_x = tokens[..., 2 * Q:3 * Q]
    v_x = tokens[..., 3 * Q:4 * Q]
    return jnp.concatenate([
        u_y * cos_y - v_y * sin_y,
        v_y * cos_y + u_y * sin_y,
        u_x * cos_x - v_x * sin_x,
        v_x * cos_x + u_x * sin_x,
    ], axis=-1)


_USE_PALLAS: bool | None = None


def _pallas_available() -> bool:
    """Pallas kernel selection: opt-in via SPANN3R_PALLAS_ROPE=1 or
    set_use_pallas(True).

    The kernel is bit-identical to the jnp path and ~20% faster standalone,
    but inside the large scan programs XLA fuses the jnp version into the
    surrounding matmuls for free while the custom call blocks fusion and
    inflates compile time — so the fused-jnp path is the default."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import os
        if os.environ.get("SPANN3R_PALLAS_ROPE") == "1":
            try:
                _USE_PALLAS = jax.devices()[0].platform in ("tpu", "axon")
            except Exception:
                _USE_PALLAS = False
        else:
            _USE_PALLAS = False
    return _USE_PALLAS


def set_use_pallas(flag: bool | None) -> None:
    """Override kernel selection (None = auto by platform)."""
    global _USE_PALLAS
    _USE_PALLAS = flag


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rope_2d_ref(tokens: jax.Array, pos: jax.Array, base: float = 100.0) -> jax.Array:
    """Pure-jnp reference implementation (CPU/debug + gradient oracle)."""
    return _apply(tokens, pos, base, sign=+1.0)


def rope_2d(tokens: jax.Array, pos: jax.Array, base: float = 100.0) -> jax.Array:
    """Apply 2D RoPE to (B, H, N, D) tokens with (B, N, 2) integer positions.

    Dispatches to the Pallas TPU kernel (ops/pallas_rope.py, the cuRoPE2D
    equivalent) on TPU backends; falls back to the fused-jnp reference
    elsewhere. Both are bit-identical (tests/test_pallas_rope.py)."""
    if _pallas_available():
        from .pallas_rope import rope_2d_pallas
        return rope_2d_pallas(tokens, pos, base)
    return rope_2d_ref(tokens, pos, base)


def _rope_fwd(tokens, pos, base):
    return _apply(tokens, pos, base, sign=+1.0), pos


def _rope_bwd(base, pos, g):
    # rotation inverse == rotation by negated angle (ref curope2d.py:24-29)
    return _apply(g, pos, base, sign=-1.0), None


rope_2d_ref.defvjp(_rope_fwd, _rope_bwd)

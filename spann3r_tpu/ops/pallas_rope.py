"""Pallas TPU kernel for 2D rotary embedding (cuRoPE2D equivalent).

The reference ships a CUDA kernel for this op
(croco/models/curope/kernels.cu:18-108) — one thread block per token,
quartered head-dim layout [u_Y | v_Y | u_X | v_X].  On TPU the same math is
a pure VPU elementwise pass; this kernel processes one (batch, head) slab of
(N, D) tokens per grid step, builds the cos/sin tables from the integer
patch positions in-register, and writes the rotated tokens — one HBM read +
one write, no intermediate cos/sin materialization.

The backward pass reuses the kernel with negated angles (rotation inverse,
ref curope2d.py:24-29).  ops/rope.py auto-selects this kernel on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rope_kernel(pos_ref, tok_ref, out_ref, *, base: float, sign: float):
    # tok_ref: (1, 1, N, D); pos_ref: (1, N, 2) int32
    n, d = tok_ref.shape[-2:]
    q = d // 4
    x = tok_ref[0, 0, :, :].astype(jnp.float32)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1).astype(jnp.float32)
    inv_freq = 1.0 / (base ** (idx / q))                     # (1, Q)
    pos_y = pos_ref[0, :, 0].astype(jnp.float32).reshape(n, 1)
    pos_x = pos_ref[0, :, 1].astype(jnp.float32).reshape(n, 1)
    ang_y = pos_y * inv_freq                                 # (N, Q)
    ang_x = pos_x * inv_freq
    cos_y, sin_y = jnp.cos(ang_y), jnp.sin(ang_y) * sign
    cos_x, sin_x = jnp.cos(ang_x), jnp.sin(ang_x) * sign

    u_y, v_y = x[:, 0 * q:1 * q], x[:, 1 * q:2 * q]
    u_x, v_x = x[:, 2 * q:3 * q], x[:, 3 * q:4 * q]
    out = jnp.concatenate([
        u_y * cos_y - v_y * sin_y,
        v_y * cos_y + u_y * sin_y,
        u_x * cos_x - v_x * sin_x,
        v_x * cos_x + u_x * sin_x,
    ], axis=-1)
    out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


def _rope_pallas_raw(tokens: jax.Array, pos: jax.Array, base: float,
                     sign: float) -> jax.Array:
    """tokens: (B, H, N, D); pos: (B, N, 2)."""
    b, h, n, d = tokens.shape
    assert d % 4 == 0, f"head dim {d} must be a multiple of 4"
    kernel = functools.partial(_rope_kernel, base=base, sign=sign)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(tokens.shape, tokens.dtype),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, n, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )(pos, tokens)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rope_2d_pallas(tokens: jax.Array, pos: jax.Array,
                   base: float = 100.0) -> jax.Array:
    return _rope_pallas_raw(tokens, pos, base, +1.0)


def _fwd(tokens, pos, base):
    return _rope_pallas_raw(tokens, pos, base, +1.0), pos


def _bwd(base, pos, g):
    return _rope_pallas_raw(g, pos, base, -1.0), None


rope_2d_pallas.defvjp(_fwd, _bwd)

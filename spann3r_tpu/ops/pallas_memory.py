"""Fused Pallas TPU kernel for the spatial-memory attention readout.

The memory read (models/memory.py memory_read, ref spann3r/model.py:145-183)
is single-head attention of P~768 queries against a C~8700-token bank with
three twists XLA cannot fuse into one streaming pass:
  1. validity masking at `size`,
  2. POST-softmax sparsification (attn < thresh -> 0) with renormalization,
  3. per-slot accumulation of the RENORMALIZED attention received (the
     prune statistic).

Flash-attention-style streaming over the bank in column blocks, three
sweeps (k, k, k+v — ~68MB of HBM traffic at 512-res vs the XLA path
materializing the (P, C) probability matrix through HBM several times):
  pass 1: online max + sum-exp per query,
  pass 2: per-query kept mass after thresholding,
  pass 3: renormalized thresholded readout + per-slot attention sums.

Inference-only (no VJP); numerically matches memory.memory_read's
masked-softmax path — see tests/test_pallas_memory.py.  Opt-in via
SPANN3R_PALLAS_MEMREAD=1 (same compile-time rationale as ops/rope.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _scores(q_ref, k_ref, size_ref, j, scale, block_c):
    q = q_ref[0].astype(jnp.float32)                       # (P, D)
    k = k_ref[0].astype(jnp.float32)                       # (BC, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = j * block_c + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < size_ref[0], s, NEG_INF)


def _pass1_kernel(size_ref, q_ref, k_ref, m_ref, z_ref, *, scale, block_c):
    """Online (max, sum-exp) accumulation over key blocks."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        z_ref[:] = jnp.zeros_like(z_ref)

    s = _scores(q_ref, k_ref, size_ref, j, scale, block_c)
    m_old = m_ref[:]                                       # (P, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    z_ref[:] = z_ref[:] * jnp.exp(m_old - m_new) + \
        jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
    m_ref[:] = m_new


def _pass2_kernel(size_ref, q_ref, k_ref, m_ref, z_ref, kept_ref,
                  *, scale, block_c, attn_thresh):
    """Per-query kept probability mass after thresholding."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        kept_ref[:] = jnp.zeros_like(kept_ref)

    s = _scores(q_ref, k_ref, size_ref, j, scale, block_c)
    a = jnp.exp(s - m_ref[:]) / z_ref[:]
    a = jnp.where(a < attn_thresh, 0.0, a)
    kept_ref[:] += jnp.sum(a, axis=1, keepdims=True)


def _pass3_kernel(size_ref, q_ref, k_ref, v_ref, m_ref, z_ref, kept_ref,
                  out_ref, asum_ref, acc_ref,
                  *, scale, block_c, attn_thresh, renorm):
    """Renormalized thresholded readout + per-slot attention sums."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = _scores(q_ref, k_ref, size_ref, j, scale, block_c)
    a = jnp.exp(s - m_ref[:]) / z_ref[:]
    if renorm:
        a = jnp.where(a < attn_thresh, 0.0, a)
        a = a / (kept_ref[:] + 1e-12)  # ref model.py:172 renorm (+ eps)

    v = v_ref[0].astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(a, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    asum_ref[0] = jnp.sum(a, axis=0)                       # (BC,) per slot

    @pl.when(j == nj - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def memory_read_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          size: jax.Array, attn_thresh: float,
                          block_c: int = 512):
    """q (1, P, D), k/v (1, C, D) layernormed; size () int32.

    Returns (out (1, P, D) in q.dtype, attn_per_slot (1, C) fp32) matching
    memory.memory_read's masked-softmax + threshold-renorm semantics.
    """
    b, p, d = q.shape
    c = k.shape[1]
    assert b == 1, "kernel is single-stream; vmap for batches"
    while c % block_c != 0:  # capacities are 128-aligned (MemoryConfig)
        block_c //= 2
    assert block_c >= 128, f"capacity {c} must be a multiple of 128"
    scale = 1.0 / (d ** 0.5)
    grid = (c // block_c,)
    size_arr = jnp.reshape(size.astype(jnp.int32), (1,))
    renorm = attn_thresh > 0

    q_spec = pl.BlockSpec((1, p, d), lambda j: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    kblk_spec = pl.BlockSpec((1, block_c, d), lambda j: (0, j, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((p, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    col_shape = jax.ShapeDtypeStruct((p, 1), jnp.float32)

    m, z = pl.pallas_call(
        functools.partial(_pass1_kernel, scale=scale, block_c=block_c),
        grid=grid,
        in_specs=[smem_spec, q_spec, kblk_spec],
        out_specs=(col_spec, col_spec),
        out_shape=(col_shape, col_shape),
    )(size_arr, q, k)

    if renorm:
        kept = pl.pallas_call(
            functools.partial(_pass2_kernel, scale=scale, block_c=block_c,
                              attn_thresh=attn_thresh),
            grid=grid,
            in_specs=[smem_spec, q_spec, kblk_spec, col_spec, col_spec],
            out_specs=col_spec,
            out_shape=col_shape,
        )(size_arr, q, k, m, z)
    else:
        kept = jnp.ones((p, 1), jnp.float32)

    out, asum = pl.pallas_call(
        functools.partial(_pass3_kernel, scale=scale, block_c=block_c,
                          attn_thresh=attn_thresh, renorm=renorm),
        grid=grid,
        in_specs=[smem_spec, q_spec, kblk_spec, kblk_spec,
                  col_spec, col_spec, col_spec],
        out_specs=(
            pl.BlockSpec((1, p, d), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_c), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((1, p, d), q.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((p, d), jnp.float32)],
    )(size_arr, q, k, v, m, z, kept)
    return out, asum

"""Fused Pallas TPU kernel for block self/cross attention (SDPA).

The transformer stacks (ViT-L encoder / dual ViT-B decoders, ref
croco/models/blocks.py:81-169) run scaled-dot-product attention at
N=196-1024 tokens, head_dim 64.  XLA materializes the (H, N, N) fp32
logits and probability tensors through HBM between the two matmuls and
the softmax reductions; at 512-res serving that is ~75 MB of HBM traffic
per ViT-L block (16 heads x 768^2 fp32 x write+read), ~1.5-2 ms/frame
summed over the 48 encoder+decoder blocks.

This kernel computes one (batch, head) attention in a single grid step
entirely in VMEM: QK^T (MXU, fp32 accum) -> max/exp/sum (VPU) -> PV
(MXU).  At Spann3R's sequence lengths the full N x N score matrix is
<2.4 MB so no streaming/flash decomposition is needed — one step is one
head.  Numerics match ops/attention._sdpa: fp32 logits + softmax, probs
cast to the value dtype for the PV matmul, fp32 accumulation.

Differentiable: the custom_vjp backward re-derives gradients through the
plain-jnp reference path (same values), so the kernel is safe under
jax.grad — though training uses the jnp path anyway (fusion with the
surrounding projections matters more under remat).

Opt-in via SPANN3R_PALLAS_ATTN=1 (serving; bench.py --pallas_attn).
Parity: tests/test_pallas_attention.py (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sdpa_kernel(q_ref, k_ref, v_ref, out_ref, *, scale):
    q = q_ref[0]                                            # (N, Dh)
    k = k_ref[0]                                            # (M, Dh)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    z = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / z).astype(v_ref.dtype)                     # match _sdpa cast
    out = jax.lax.dot_general(probs, v_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _sdpa_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                 scale: float) -> jax.Array:
    """q (B, H, N, Dh), k/v (B, H, M, Dh) -> (B, H, N, Dh) in v.dtype."""
    b, h, n, d = q.shape
    m = k.shape[2]
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    head_spec = lambda rows: pl.BlockSpec((1, rows, d), lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sdpa_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[head_spec(n), head_spec(m), head_spec(m)],
        out_specs=head_spec(n),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), v.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _sdpa_jnp(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
               scale: float) -> jax.Array:
    return _sdpa_pallas(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _sdpa_pallas(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_jnp(q_, k_, v_, scale), q, k, v)
    return vjp(g)


fused_sdpa.defvjp(_fwd, _bwd)

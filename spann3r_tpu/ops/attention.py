"""Self/cross attention ops (ref croco/models/blocks.py:81-169).

Einsum attention with fp32 logit accumulation.  SPANN3R_PALLAS_ATTN=1
switches to a fused Pallas SDPA kernel (ops/pallas_attention.py) — kept
opt-in because it MEASURES SLOWER at Spann3R's shapes (47.3 vs 50.8 FPS
@512-res serving): the custom call forces the post-RoPE q/k/v to
materialize through HBM, while the jnp path lets XLA fuse rope +
transpose into the QK^T producer and the softmax chain into the PV
matmul.  The kernel only pays off for sequences too long for that
fusion (N >> 1024), which Spann3R never reaches.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .layers import init_linear, linear
from .rope import rope_2d


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    if (os.environ.get("SPANN3R_FLASH_ATTN") == "1"
            and q.shape[2] % 128 == 0 and k.shape[2] % 128 == 0
            and jax.default_backend() != "cpu"):
        # jax's tuned TPU flash kernel (pipelined q/k blocks, online
        # softmax); shapes with N % 128 != 0 (224-res: N=196) fall through
        # to the jnp path, as does CPU (the kernel is Mosaic-only)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        return flash_attention(q, k, v, sm_scale=scale).astype(v.dtype)
    if os.environ.get("SPANN3R_PALLAS_ATTN") == "1":
        from .pallas_attention import fused_sdpa
        return fused_sdpa(q, k, v, scale)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    # checkpoint names let selective remat policies keep the attention
    # chain resident (see models/vit._remat_policy); inert otherwise
    probs = checkpoint_name(jax.nn.softmax(logits, axis=-1).astype(v.dtype),
                            "attn_probs")
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return checkpoint_name(out, "attn_out")


def self_attention(p, x: jax.Array, pos: Optional[jax.Array], num_heads: int,
                   rope_base: float = 100.0) -> jax.Array:
    """Packed-QKV self-attention with RoPE on q,k (ref blocks.py:94-112)."""
    b, n, c = x.shape
    head_dim = c // num_heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, num_heads, head_dim)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, Dh)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if pos is not None and rope_base > 0:
        q = rope_2d(q, pos, rope_base)
        k = rope_2d(k, pos, rope_base)
    q, k, v = (checkpoint_name(t, "qkv") for t in (q, k, v))
    out = _sdpa(q, k, v, head_dim ** -0.5)
    return linear(p["proj"], _merge_heads(out))


def cross_attention(p, query: jax.Array, key: jax.Array, value: jax.Array,
                    qpos: Optional[jax.Array], kpos: Optional[jax.Array],
                    num_heads: int, rope_base: float = 100.0) -> jax.Array:
    """Separate q/k/v projections (ref blocks.py:132-169)."""
    c = query.shape[-1]
    head_dim = c // num_heads
    q = _split_heads(linear(p["projq"], query), num_heads)
    k = _split_heads(linear(p["projk"], key), num_heads)
    v = _split_heads(linear(p["projv"], value), num_heads)
    if qpos is not None and rope_base > 0:
        q = rope_2d(q, qpos, rope_base)
    if kpos is not None and rope_base > 0:
        k = rope_2d(k, kpos, rope_base)
    q, k, v = (checkpoint_name(t, "qkv") for t in (q, k, v))
    out = _sdpa(q, k, v, head_dim ** -0.5)
    return linear(p["proj"], _merge_heads(out))


def init_self_attention(key, dim: int, qkv_bias: bool = True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"qkv": init_linear(k1, dim, dim * 3, bias=qkv_bias, dtype=dtype),
            "proj": init_linear(k2, dim, dim, bias=True, dtype=dtype)}


def init_cross_attention(key, dim: int, qkv_bias: bool = True, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {"projq": init_linear(kq, dim, dim, bias=qkv_bias, dtype=dtype),
            "projk": init_linear(kk, dim, dim, bias=qkv_bias, dtype=dtype),
            "projv": init_linear(kv, dim, dim, bias=qkv_bias, dtype=dtype),
            "proj": init_linear(ko, dim, dim, bias=True, dtype=dtype)}

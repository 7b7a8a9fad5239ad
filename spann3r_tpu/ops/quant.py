"""Int8 weight-only quantization for serving.

Per-output-channel symmetric int8 on the large linear weights ({'w':
(in, out)} dicts, including (L, in, out) stacked scan blocks): q =
round(w / s), s = max|w| over the contraction axis / 127.  `ops.layers
.linear` dequantizes at use (q.astype(bf16) * s), which XLA fuses into
the matmul's weight load — halving weight HBM traffic vs bf16 while the
MXU still computes in bf16 with fp32 accumulation.

The win is bounded: the streaming decoder reads ~450 MB of weights per
frame (sequential, B=1), everything else amortizes weights over the
32-frame chunk — see PERF.md.  Opt-in (bench.py --int8 / demo.py
--int8); accuracy pinned by tests/test_quant.py.

The reference has no quantized path; this is a TPU-serving extra.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_serving_weights(params, dtype=jnp.bfloat16):
    """Store serving weights in bf16 — bit-identical under BF16 precision.

    linear/conv cast `w`/`b` to the ACTIVATION dtype at every use site
    (ops/layers.py:29-39), so for leaves consumed only by bf16-activation
    paths, storing bf16 produces exactly the same compute as storing fp32
    and casting per program — while halving device residency (~1.3 GB for
    the full model) and checkpoint->device transfer. Kept fp32 because
    their use sites UPCAST to fp32 (where bf16 storage would change
    numerics):
      - LayerNorm {'scale','bias'} nodes (normalized in fp32 for parity
        with the reference's AMP policy, ops/layers.py:42-49);
      - 'head*' subtrees (fp32 heads, config.BF16.head_dtype).
    Exactness is pinned by tests/test_quant.py. Works on numpy or jax
    leaves; returns a new pytree.
    """
    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias"}:  # LayerNorm: fp32 use site
                return dict(node)
            return {k: (v if k.startswith("head") else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if node is None or not jnp.issubdtype(node.dtype, jnp.floating):
            return node
        return node.astype(dtype)

    return walk(params)


def _quantize_weight(w: jax.Array):
    """w (..., in, out) fp -> (q int8, scale fp32 broadcastable to w)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_linear_weights(params, min_dim: int = 512):
    """Replace eligible linear weights with {'w_q', 'w_scale'} pairs.

    Eligible: dict nodes holding a 2-D (in, out) or 3-D stacked (L, in,
    out) 'w' whose last two dims are both >= min_dim — i.e. the
    transformer matrices; 4-D conv kernels (consumed by conv2d, which has
    no dequant path), head subtrees (keys starting with "head" — they
    regress the output directly and stay full precision, matching the
    fp32-heads policy; "attn_head_*" too, since their outputs drive the
    memory-dedup cosine test against sim_thresh where small drift can flip
    keep/skip decisions), and biases are untouched.  Returns a new pytree;
    the input is not mutated.
    """
    def walk(node):
        if isinstance(node, dict):
            out = {k: (v if (k.startswith("head")
                             or k.startswith("attn_head")) else walk(v))
                   for k, v in node.items()}
            w = node.get("w")
            if (w is not None and hasattr(w, "ndim") and w.ndim in (2, 3)
                    and w.shape[-2] >= min_dim and w.shape[-1] >= min_dim):
                q, scale = _quantize_weight(w)
                del out["w"]
                out["w_q"], out["w_scale"] = q, scale
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def count_quantized(params) -> int:
    n = [0]

    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node:
                n[0] += 1
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return n[0]

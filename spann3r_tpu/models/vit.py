"""ViT encoder/decoder stacks (ref croco/models/blocks.py:114-191).

TPU-first design choices:
  - Per-depth params are stacked along a leading axis and the stack runs under
    `lax.scan`, so the 24-deep encoder compiles as ONE block body instead of 24
    inlined copies (fast compiles, identical runtime — XLA unrolls nothing it
    doesn't need to).
  - The decoder depth loop runs as scan segments between DPT hook points, so
    only the hook states the head consumes (ref dust3r/model.py:186-205) are
    ever materialized — no per-block stacking buffer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from ..ops.attention import (cross_attention, init_cross_attention,
                             init_self_attention, self_attention)
from ..ops.layers import (conv2d, init_conv2d, init_layer_norm, init_mlp,
                          layer_norm, mlp)


# ---------------------------------------------------------------------------
# single blocks
# ---------------------------------------------------------------------------

def block_apply(p, x: jax.Array, pos: Optional[jax.Array], cfg: ViTConfig) -> jax.Array:
    """Pre-LN self-attn + MLP block (ref blocks.py:127-130)."""
    x = x + self_attention(p["attn"], layer_norm(p["norm1"], x, cfg.ln_eps),
                           pos, cfg.num_heads, cfg.rope_base)
    x = x + mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.ln_eps))
    return x


def decoder_block_apply(p, x: jax.Array, y: jax.Array,
                        xpos: Optional[jax.Array], ypos: Optional[jax.Array],
                        cfg: ViTConfig) -> jax.Array:
    """Self-attn -> cross-attn(normed y) -> MLP (ref blocks.py:186-191)."""
    x = x + self_attention(p["attn"], layer_norm(p["norm1"], x, cfg.ln_eps),
                           xpos, cfg.num_heads, cfg.rope_base)
    y_ = layer_norm(p["norm_y"], y, cfg.ln_eps)
    x = x + cross_attention(p["cross_attn"], layer_norm(p["norm2"], x, cfg.ln_eps),
                            y_, y_, xpos, ypos, cfg.num_heads, cfg.rope_base)
    x = x + mlp(p["mlp"], layer_norm(p["norm3"], x, cfg.ln_eps))
    return x


def init_block(key, cfg: ViTConfig, dtype=jnp.float32):
    ka, km = jax.random.split(key)
    return {
        "norm1": init_layer_norm(cfg.dim, dtype),
        "attn": init_self_attention(ka, cfg.dim, cfg.qkv_bias, dtype),
        "norm2": init_layer_norm(cfg.dim, dtype),
        "mlp": init_mlp(km, cfg.dim, int(cfg.dim * cfg.mlp_ratio), dtype),
    }


def init_decoder_block(key, cfg: ViTConfig, dtype=jnp.float32):
    ka, kc, km = jax.random.split(key, 3)
    return {
        "norm1": init_layer_norm(cfg.dim, dtype),
        "attn": init_self_attention(ka, cfg.dim, cfg.qkv_bias, dtype),
        "norm2": init_layer_norm(cfg.dim, dtype),
        "cross_attn": init_cross_attention(kc, cfg.dim, cfg.qkv_bias, dtype),
        "norm3": init_layer_norm(cfg.dim, dtype),
        "mlp": init_mlp(km, cfg.dim, int(cfg.dim * cfg.mlp_ratio), dtype),
        "norm_y": init_layer_norm(cfg.dim, dtype),
    }


def stack_params(param_list):
    """Stack a list of identically-shaped param pytrees along a new axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def init_block_stack(key, cfg: ViTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth)
    return stack_params([init_block(k, cfg, dtype) for k in keys])


def init_decoder_block_stack(key, cfg: ViTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth)
    return stack_params([init_decoder_block(k, cfg, dtype) for k in keys])


# ---------------------------------------------------------------------------
# stacked-scan encoders/decoders
# ---------------------------------------------------------------------------

def _remat_policy():
    """Checkpoint policy for block rematerialization.

    SPANN3R_REMAT_POLICY selects what the backward pass may reuse instead
    of recomputing (default: nothing — minimum memory, full recompute):
      dots  — keep every matmul output resident (recompute only the cheap
              elementwise chain); OOMs the 16 GB chip at B=4 T=5 @224
              full-size (the 4x-width MLP hiddens dominate).
      attn  — keep ONLY the checkpoint-named attention chain (post-rope
              q/k/v, softmax probs, PV output; ops/attention.py) — the
              backward then recomputes just layernorms + the MLP fc1
              matmul, cutting ~2/3 of the recompute FLOPs for ~1/3 of the
              dots policy's residency (MLP hiddens excluded by name).
      nomlp — keep everything EXCEPT the named MLP hiddens (broader than
              dots: every intermediate is saveable).

    Measured on the v5e at Spann3R train shapes these LOSE to the default
    full-recompute (PERF.md: pinned q/k/v+probs break the rope/softmax
    matmul fusions and the saves crowd out compile memory at B=4); they
    are numerics-neutral opt-ins for other shape regimes, not the
    recommended operating point."""
    import os
    val = os.environ.get("SPANN3R_REMAT_POLICY")
    if val == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if val == "attn":
        return jax.checkpoint_policies.save_only_these_names(
            "qkv", "attn_probs", "attn_out")
    if val == "nomlp":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "mlp_pre", "mlp_hidden")
    return None


def _maybe_remat(body, remat: bool):
    if not remat:
        return body
    pol = _remat_policy()
    if pol is None:
        return jax.checkpoint(body)
    return jax.checkpoint(body, policy=pol)


def encoder_apply(stacked, x: jax.Array, pos: Optional[jax.Array],
                  cfg: ViTConfig, remat: bool = False) -> jax.Array:
    """Run a stack of Blocks via lax.scan over the depth axis."""
    def body(carry, p):
        out = block_apply(p, carry, pos, cfg)
        return out, None

    body = _maybe_remat(body, remat)
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def dual_decoder_apply(stacked1, stacked2, f1: jax.Array, f2: jax.Array,
                       pos1, pos2, cfg: ViTConfig, remat: bool = False,
                       hooks: Optional[Tuple[int, ...]] = None):
    """Dual cross-attending decoder streams (ref dust3r/model.py:186-205).

    Each step the two streams attend to the *other* stream's previous output.

    `hooks` is an ascending tuple of 1-based block indices whose outputs are
    needed (the DPT hook contract, dust3r/heads/dpt_head.py:110); only those
    states are materialized — the depth loop runs as scan SEGMENTS between
    hook points, so no (depth, B, N, C) stacking buffer is written per block
    (profiled at ~1.7 ms/frame of dynamic-update-slice traffic at 512-res).
    Returns {block_index: (y1, y2)}.  hooks=None keeps every state.
    """
    if hooks is None:
        hooks = tuple(range(1, cfg.depth + 1))
    assert hooks and list(hooks) == sorted(set(hooks)) and hooks[-1] == cfg.depth

    def body(carry, ps):
        c1, c2 = carry
        p1, p2 = ps
        n1 = decoder_block_apply(p1, c1, c2, pos1, pos2, cfg)
        n2 = decoder_block_apply(p2, c2, c1, pos2, pos1, cfg)
        return (n1, n2), None

    body = _maybe_remat(body, remat)
    out = {}
    carry = (f1, f2)
    start = 0
    for h in hooks:
        seg = jax.tree.map(lambda a: a[start:h], (stacked1, stacked2))
        carry, _ = jax.lax.scan(body, carry, seg)
        out[h] = carry
        start = h
    return out


# ---------------------------------------------------------------------------
# sincos positional embedding (ref croco/models/pos_embed.py:22-69)
# ---------------------------------------------------------------------------

def get_1d_sincos_pos_embed(embed_dim: int, pos) -> jnp.ndarray:
    import numpy as np
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=float) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", np.asarray(pos).reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size,
                            n_cls_token: int = 0) -> jnp.ndarray:
    """(gh*gw[+cls], D) cosine table for non-RoPE CroCo variants.
    grid_size: int (square) or (gh, gw).  The reference only builds square
    grids and bicubic-interpolates the stored buffer to other sizes
    (croco/models/pos_embed.py interpolate_pos_embed); computing the exact
    rectangular table on the fly subsumes both steps."""
    import numpy as np
    gh, gw = ((grid_size, grid_size) if isinstance(grid_size, int)
              else grid_size)
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first (ref)
    emb_h = get_1d_sincos_pos_embed(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if n_cls_token > 0:
        emb = np.concatenate([np.zeros([n_cls_token, embed_dim]), emb], axis=0)
    return jnp.asarray(emb, jnp.float32)


# ---------------------------------------------------------------------------
# patch embedding
# ---------------------------------------------------------------------------

def patch_positions(h_patches: int, w_patches: int) -> jax.Array:
    """(N, 2) int32 (y, x) positions, row-major (ref blocks.py:195-207)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h_patches, w_patches), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h_patches, w_patches), 1)
    return jnp.stack([ys, xs], axis=-1).reshape(-1, 2)


def patch_embed_apply(p, img: jax.Array, patch_size: int = 16) -> Tuple[jax.Array, jax.Array]:
    """img: (B, H, W, C) NHWC -> tokens (B, N, D), positions (B, N, 2).

    Equivalent to the reference's Conv2d(k=16, s=16) + flatten
    (ref blocks.py:209-236 / dust3r/patch_embed.py:19-29), landscape layout.

    Computed as space-to-depth + matmul rather than a conv: a k=s conv IS
    this dot, but XLA lowers the conv's INPUT gradient as a 3-output-channel
    transposed conv that runs ~105 ms/call on the MXU (3 channels against
    128 lanes).  That cost hits training through pos_patch_embed, whose
    input is the PREDICTED pointmap (profiled: 4 calls = half the train
    step).  The HWIO kernel (kh, kw, cin, cout) flattens row-major in
    exactly the patch-vector order, so weights are interchangeable with the
    conv form (checkpoint layout untouched)."""
    b, h, w, c = img.shape
    assert h % patch_size == 0 and w % patch_size == 0
    hp, wp = h // patch_size, w // patch_size
    x = img.reshape(b, hp, patch_size, wp, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * wp,
                                              patch_size * patch_size * c)
    wk = p["proj"]["w"].astype(x.dtype)
    tokens = jnp.einsum("bnk,kd->bnd", x, wk.reshape(-1, wk.shape[-1]),
                        preferred_element_type=jnp.float32).astype(x.dtype)
    bias = p["proj"].get("b")
    if bias is not None:
        tokens = tokens + bias.astype(x.dtype)
    pos = jnp.broadcast_to(patch_positions(hp, wp)[None], (b, hp * wp, 2))
    return tokens, pos


def init_patch_embed(key, patch_size: int, in_chans: int, dim: int, dtype=jnp.float32):
    return {"proj": init_conv2d(key, patch_size, patch_size, in_chans, dim,
                                bias=True, dtype=dtype, xavier_flat=True)}

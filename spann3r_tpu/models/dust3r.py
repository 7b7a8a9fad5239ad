"""Two-view pointmap backbone (TPU rebuild of dust3r/model.py:54-225).

Pure-functional: params are a pytree, all entry points are jit-able.  The
encoder/decoders run as lax.scan block stacks; both decoder streams and both
heads share one traced program.

The reference's `_encode_symmetrized` half-forward trick is unnecessary here:
callers batch images through `encode_image` however they like (Spann3R's
sequential loop encodes every frame exactly once, batched over time).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import DUSt3RConfig, Precision, BF16
from ..ops.layers import init_layer_norm, init_linear, layer_norm, linear
from .heads import head_apply, init_head
from .vit import (dual_decoder_apply, encoder_apply, init_block_stack,
                  init_decoder_block_stack, init_patch_embed, patch_embed_apply)


def init_dust3r(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    return {
        "patch_embed": init_patch_embed(keys[0], cfg.patch_size, 3, cfg.enc.dim, dtype),
        "enc_blocks": init_block_stack(keys[1], cfg.enc, dtype),
        "enc_norm": init_layer_norm(cfg.enc.dim, dtype),
        "decoder_embed": init_linear(keys[2], cfg.enc.dim, cfg.dec.dim, dtype=dtype),
        "dec_blocks": init_decoder_block_stack(keys[3], cfg.dec, dtype),
        "dec_blocks2": init_decoder_block_stack(keys[4], cfg.dec, dtype),
        "dec_norm": init_layer_norm(cfg.dec.dim, dtype),
        "head1": init_head(keys[5], cfg, dtype),
        "head2": init_head(keys[6], cfg, dtype),
    }


def encode_image(params, img: jax.Array, cfg: DUSt3RConfig,
                 prec: Precision = BF16, remat: bool = False) -> Tuple[jax.Array, jax.Array]:
    """img: (B, H, W, 3) normalized NHWC -> tokens (B, N, D), pos (B, N, 2).

    Ref: dust3r/model.py:131-154 (patch embed -> 24 blocks -> norm).
    """
    x, pos = patch_embed_apply(params["patch_embed"], img.astype(prec.compute_dtype),
                               cfg.patch_size)
    x = encoder_apply(params["enc_blocks"], x, pos, cfg.enc, remat=remat)
    x = layer_norm(params["enc_norm"], x, cfg.enc.ln_eps)
    return x, pos


def head_hooks(cfg: DUSt3RConfig) -> Tuple[int, ...]:
    """1-based decoder-block indices whose outputs the head consumes."""
    if cfg.head_type == "dpt":
        need = {h for h in cfg.dpt_hooks if h >= 1} | {cfg.dec.depth}
    else:
        need = {cfg.dec.depth}
    return tuple(sorted(need))


def states_from_hooks(cfg: DUSt3RConfig, packed) -> list:
    """Expand a packed (state0, *hook_states) sequence back into the
    1 + dec.depth hook-state list `downstream_head` expects, with None at
    indices the head never reads.  Single source of truth for the packing
    order used by carried/deferred head states (head2_from_hooks, bench's
    MFU head accounting)."""
    states: list = [packed[0]] + [None] * cfg.dec.depth
    for h, s in zip(head_hooks(cfg), packed[1:]):
        states[h] = s
    return states


def decoder(params, f1: jax.Array, pos1: jax.Array, f2: jax.Array,
            pos2: jax.Array, cfg: DUSt3RConfig, prec: Precision = BF16,
            remat: bool = False) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Dual cross-attending decoder (ref dust3r/model.py:186-205).

    Returns two lists of 1 + dec.depth states: [pre-projection (enc dim)] +
    per-block outputs (dec dim), with the final state normed — the hook-state
    contract the DPT head expects.  Entries the head never reads are None
    (the depth loop only materializes hook states; see
    vit.dual_decoder_apply).
    """
    f1 = f1.astype(prec.compute_dtype)
    f2 = f2.astype(prec.compute_dtype)
    p1 = linear(params["decoder_embed"], f1)
    p2 = linear(params["decoder_embed"], f2)
    hooks = head_hooks(cfg)
    ys = dual_decoder_apply(params["dec_blocks"], params["dec_blocks2"],
                            p1, p2, pos1, pos2, cfg.dec, remat=remat,
                            hooks=hooks)
    out1: List = [f1] + [None] * cfg.dec.depth
    out2: List = [f2] + [None] * cfg.dec.depth
    for h, (y1, y2) in ys.items():
        out1[h], out2[h] = y1, y2
    out1[-1] = layer_norm(params["dec_norm"], out1[-1], cfg.dec.ln_eps)
    out2[-1] = layer_norm(params["dec_norm"], out2[-1], cfg.dec.ln_eps)
    return out1, out2


def downstream_head(params, head_num: int, dec_states: List[jax.Array],
                    img_hw: Tuple[int, int], cfg: DUSt3RConfig,
                    prec: Precision = None) -> Dict[str, jax.Array]:
    """Heads run fp32 by default (ref dust3r/model.py:220-222); a serving
    precision with head_dtype=bf16 trades a little accuracy for conv speed.
    The final postprocess (exp-norm) always computes in the head dtype and
    returns it unchanged."""
    dt = jnp.float32 if prec is None else prec.head_dtype
    states = [None if s is None else s.astype(dt) for s in dec_states]
    out = head_apply(params[f"head{head_num}"], states, img_hw, cfg)
    return {k: v.astype(jnp.float32) for k, v in out.items()}


def forward_mixed(params, img1, img2, true_shape1, true_shape2,
                  cfg: DUSt3RConfig, prec: Precision = BF16) -> Tuple[Dict, Dict]:
    """Mixed portrait/landscape batches (ref ManyAR_PatchEmbed +
    transpose_to_landscape, dust3r/utils/misc.py:54-96).

    Host-side split-compute-scatter: portrait samples are transposed to
    landscape, run through the same compiled landscape program, and their
    outputs transposed back — static shapes per orientation group, at most
    two compiled programs per resolution.

    img1/img2: (B, H, W, 3) numpy with W >= H (portrait content pre-rotated
    by the data pipeline); true_shape*: (B, 2) int (h, w) actual shapes.
    """
    import numpy as np

    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    land1 = np.asarray(true_shape1)[:, 1] >= np.asarray(true_shape1)[:, 0]
    land2 = np.asarray(true_shape2)[:, 1] >= np.asarray(true_shape2)[:, 0]
    b = img1.shape[0]

    res1_out: list = [None] * b
    res2_out: list = [None] * b
    # each view's orientation is independent (ref handles per-view shapes):
    # group pairs by the (portrait1, portrait2) tuple — at most 4 programs
    for p1 in (False, True):
        for p2 in (False, True):
            sel = np.nonzero((land1 != p1) & (land2 != p2))[0]
            if len(sel) == 0:
                continue
            a1 = img1[sel].swapaxes(1, 2) if p1 else img1[sel]
            a2 = img2[sel].swapaxes(1, 2) if p2 else img2[sel]
            r1, r2 = forward(params, jnp.asarray(a1), jnp.asarray(a2),
                             cfg, prec)
            r1 = {k: np.asarray(v) for k, v in r1.items()}
            r2 = {k: np.asarray(v) for k, v in r2.items()}
            if p1:
                r1 = {k: v.swapaxes(1, 2) for k, v in r1.items()}
            if p2:
                r2 = {k: v.swapaxes(1, 2) for k, v in r2.items()}
            for n, bi in enumerate(sel):
                res1_out[bi] = {k: v[n] for k, v in r1.items()}
                res2_out[bi] = {k: v[n] for k, v in r2.items()}
    stack = lambda lst: {k: np.stack([d[k] for d in lst]) for k in lst[0]}
    return stack(res1_out), stack(res2_out)


def forward(params, img1: jax.Array, img2: jax.Array, cfg: DUSt3RConfig,
            prec: Precision = BF16) -> Tuple[Dict, Dict]:
    """Two-view forward (ref dust3r/model.py:213-225).

    img1, img2: (B, H, W, 3).  res2's pointmap lives in view1's frame.
    """
    hw = img1.shape[1:3]
    hw2 = img2.shape[1:3]
    b = img1.shape[0]
    if hw == hw2:
        # batch both views through the encoder in one pass (MXU-friendly)
        feats, pos = encode_image(params, jnp.concatenate([img1, img2], axis=0),
                                  cfg, prec)
        f1, f2 = feats[:b], feats[b:]
        pos1, pos2 = pos[:b], pos[b:]
    else:
        # different spatial shapes (mixed-orientation pair) -> encode
        # separately (ref dust3r/model.py:156-165)
        f1, pos1 = encode_image(params, img1, cfg, prec)
        f2, pos2 = encode_image(params, img2, cfg, prec)
    dec1, dec2 = decoder(params, f1, pos1, f2, pos2, cfg, prec)
    res1 = downstream_head(params, 1, dec1, hw, cfg, prec)
    res2 = downstream_head(params, 2, dec2, hw2, cfg, prec)
    res2["pts3d_in_other_view"] = res2.pop("pts3d")
    return res1, res2

"""CroCo downstream-task adapters (ref croco/models/croco_downstream.py,
croco/models/head_downstream.py).

The reference wraps CroCoNet for dense per-pixel downstream tasks: an
encoder-only monocular variant and an encoder+decoder binocular variant,
each feeding a pluggable head that may request ALL intermediate states
(return_all_blocks) for DPT-style hooks.  Here the same capabilities are
pure functions over the croco_pretrain parameter pytree:

  - croco_args_from_ckpt: recover the architecture kwargs from a released
    checkpoint (v2 'croco_kwargs' dict, official 'args.model' string — parsed
    with ast, NOT eval'd like the reference — or v1 defaults)
  - dpt_hook_indices: the reference's automatic hook placement
  - downstream_monocular / downstream_binocular: forward passes that hand a
    head_fn the collected states + image size

Any head_fn with the (states, img_hw) signature plugs in; the stereoflow
task family's PixelwiseTaskWithDPT lives in spann3r_tpu/stereoflow/head.py.
"""
from __future__ import annotations

import ast
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import BF16, DUSt3RConfig, Precision
from ..ops.layers import layer_norm, linear
from .croco_pretrain import get_2d_sincos_pos_embed
from .vit import (block_apply, decoder_block_apply, patch_embed_apply)


def croco_args_from_ckpt(ckpt: Dict) -> Dict:
    """Architecture kwargs from a checkpoint dict (ref
    croco_downstream.py:13-21).  The official-release path stores a
    'CroCoNet(...)' string; the reference eval()s it — here it is parsed
    with ast.literal_eval on keyword literals only."""
    if "croco_kwargs" in ckpt:  # CroCo v2 released models
        return dict(ckpt["croco_kwargs"])
    args = ckpt.get("args")
    model_str = getattr(args, "model", None) if args is not None else None
    if model_str is not None:  # pretrained with the official code release
        node = ast.parse(model_str, mode="eval").body
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "CroCoNet"):
            raise ValueError(f"expected 'CroCoNet(...)', got {model_str!r}")
        return {k.arg: ast.literal_eval(k.value) for k in node.keywords}
    return {}  # CroCo v1 released models: all defaults


def cfg_from_croco_kwargs(kw: Dict, img_size) -> DUSt3RConfig:
    """CroCoNet constructor kwargs -> DUSt3RConfig — the single home of
    this mapping (pretraining model strings, downstream ckpt args and the
    stereoflow drivers all route here; ref croco/models/croco.py:23-37
    defaults).  Callers pop their own non-architecture keys (img_size,
    mask_ratio) first; unknown leftovers raise so checkpoints built with
    kwargs this port doesn't model can't be silently mis-assembled."""
    kw = dict(kw)
    pos = kw.pop("pos_embed", "cosine")
    rope = 100.0 if str(pos).startswith("RoPE") else 0.0
    from ..config import ViTConfig
    cfg = DUSt3RConfig(
        img_size=tuple(img_size),
        patch_size=kw.pop("patch_size", 16),
        enc=ViTConfig(dim=kw.pop("enc_embed_dim", 768),
                      depth=kw.pop("enc_depth", 12),
                      num_heads=kw.pop("enc_num_heads", 12),
                      rope_base=rope),
        dec=ViTConfig(dim=kw.pop("dec_embed_dim", 512),
                      depth=kw.pop("dec_depth", 8),
                      num_heads=kw.pop("dec_num_heads", 16),
                      rope_base=rope),
    )
    if kw:
        raise ValueError(f"unsupported CroCoNet kwargs: {sorted(kw)}")
    return cfg


def croco_kwargs_from_cfg(cfg: DUSt3RConfig) -> Dict:
    """Inverse of cfg_from_croco_kwargs (architecture keys only)."""
    return {"enc_embed_dim": cfg.enc.dim, "enc_depth": cfg.enc.depth,
            "enc_num_heads": cfg.enc.num_heads,
            "dec_embed_dim": cfg.dec.dim, "dec_depth": cfg.dec.depth,
            "dec_num_heads": cfg.dec.num_heads,
            "patch_size": cfg.patch_size,
            "pos_embed": "RoPE100" if cfg.enc.rope_base > 0 else "cosine"}


def dpt_hook_indices(enc_depth: int, dec_depth: int = None) -> List[int]:
    """Automatic DPT hook placement (ref head_downstream.py:40-47):
    encoder-only -> 4 equally spread encoder layers; encoder+decoder ->
    last encoder state + 3 equally spread decoder states, indexing into
    the concatenated [enc states..., dec states...] list."""
    if dec_depth is None:
        step = enc_depth // 4
        return [enc_depth - 1 - i * step for i in range(3, -1, -1)]
    # the reference's table covers its released depths; ceil(d/3)
    # reproduces every entry and extends to other depths (tiny test models)
    step = {8: 3, 12: 4, 24: 8}.get(dec_depth, max(1, -(-dec_depth // 3)))
    return [dec_depth + enc_depth - 1 - i * step for i in range(3, -1, -1)]


def _encode_all(params, img: jax.Array, cfg: DUSt3RConfig,
                prec: Precision) -> Tuple[List[jax.Array], jax.Array]:
    """Full (unmasked) encode collecting EVERY block output; final state is
    enc_norm'ed like the reference's return_all_blocks path
    (ref croco.py:129-164)."""
    x, pos = patch_embed_apply(params["patch_embed"],
                               img.astype(prec.compute_dtype), cfg.patch_size)
    if cfg.enc.rope_base <= 0:
        grid = (img.shape[1] // cfg.patch_size,
                img.shape[2] // cfg.patch_size)
        x = x + get_2d_sincos_pos_embed(cfg.enc.dim,
                                        grid)[None].astype(x.dtype)

    def body(carry, p):
        out = block_apply(p, carry, pos, cfg.enc)
        return out, out

    last, ys = jax.lax.scan(body, x, params["enc_blocks"])
    states = [ys[i] for i in range(cfg.enc.depth)]
    states[-1] = layer_norm(params["enc_norm"], states[-1], cfg.enc.ln_eps)
    return states, pos


def downstream_monocular(params, img: jax.Array, cfg: DUSt3RConfig,
                         head_fn: Callable, prec: Precision = BF16,
                         all_blocks: bool = True):
    """Encoder-only monocular task forward (ref croco_downstream.py:24-64):
    head_fn(states, (H, W)) with states = all block outputs (or just the
    final one when all_blocks=False)."""
    h, w = img.shape[1:3]
    states, _ = _encode_all(params, img, cfg, prec)
    return head_fn(states if all_blocks else states[-1], (h, w))


def downstream_binocular(params, img1: jax.Array, img2: jax.Array,
                         cfg: DUSt3RConfig, head_fn: Callable,
                         prec: Precision = BF16, all_blocks: bool = True):
    """Binocular task forward (ref croco_downstream.py:67-122): both images
    encoded in ONE batched pass (the reference concatenates on batch for
    the same reason), decoder cross-attends img2, head sees
    [enc states..., dec states...] like the reference's `out + decout`."""
    b, h, w, _ = img1.shape
    states, pos = _encode_all(params, jnp.concatenate([img1, img2]), cfg,
                              prec)
    enc1 = [s[:b] for s in states]
    f1, f2 = states[-1][:b], states[-1][b:]
    pos1 = pos[:b]
    pos2 = pos[b:]

    d1 = linear(params["decoder_embed"], f1)
    d2 = linear(params["decoder_embed"], f2)
    if cfg.dec.rope_base <= 0:
        pe = get_2d_sincos_pos_embed(
            cfg.dec.dim, (h // cfg.patch_size, w // cfg.patch_size))[None]
        d1 = d1 + pe.astype(d1.dtype)
        d2 = d2 + pe.astype(d2.dtype)

    def body(carry, p):
        c1, c2 = carry
        n1 = decoder_block_apply(p, c1, c2, pos1, pos2, cfg.dec)
        return (n1, c2), n1

    (_, _), ys = jax.lax.scan(body, (d1, d2), params["dec_blocks"])
    dec_states = [ys[i] for i in range(cfg.dec.depth)]
    dec_states[-1] = layer_norm(params["dec_norm"], dec_states[-1],
                                cfg.dec.ln_eps)
    if all_blocks:
        return head_fn(enc1 + dec_states, (h, w))
    return head_fn(dec_states[-1], (h, w))


def linear_pixelwise_head(key, cfg: DUSt3RConfig, num_channels: int = 1):
    """Minimal dense head: linear proj of the final state to per-patch
    pixels + depth-to-space (the reference's stereoflow heads are
    non-goals; this provides the pluggable-head contract + a working
    default).  Returns (params, head_fn)."""
    from ..ops.layers import init_linear
    ps = cfg.patch_size
    p = init_linear(key, cfg.dec.dim, ps * ps * num_channels)

    def head_fn(states, img_hw):
        x = states[-1] if isinstance(states, (list, tuple)) else states
        h, w = img_hw
        out = linear(p, x.astype(jnp.float32))  # (B, N, ps*ps*C)
        gh, gw = h // ps, w // ps
        b = out.shape[0]
        out = out.reshape(b, gh, gw, ps, ps, num_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, num_channels)

    return p, head_fn

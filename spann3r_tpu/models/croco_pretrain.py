"""CroCo masked cross-view completion pretraining (ref croco/models/croco.py).

The foundation capability under DUSt3R: mask most of image 1, encode its
visible patches, cross-attend a decoder over the full image 2, and regress
the masked RGB patches (MaskedMSE, ref croco/models/criterion.py).

TPU-first: RandomMask keeps an EXACT masked count (argsort-of-noise, ref
croco/models/masking.py:12-25), so the visible token count is static —
visible tokens are gathered into a fixed (B, N_vis, D) tensor and the
decoder scatters them back over learned mask tokens, all under one jit with
no dynamic shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import BF16, DUSt3RConfig, Precision
from ..ops.layers import init_layer_norm, init_linear, layer_norm, linear
from .vit import (decoder_block_apply, encoder_apply,
                  get_2d_sincos_pos_embed, init_block_stack,
                  init_decoder_block_stack, init_patch_embed,
                  patch_embed_apply)


def init_croco(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    """CroCoNet params: shared encoder, single cross-attending decoder,
    mask token + linear RGB prediction head (ref croco.py:39-108).

    One fused jitted program on accelerator backends (eager per-leaf RNG
    dispatches each pay a tunnel round-trip on the axon setup — see
    models/spann3r.init_spann3r); plain eager on CPU where tests init
    many tiny configs."""
    if jax.default_backend() != "cpu":
        return _init_croco_jitted(key, cfg, dtype)
    return _init_croco(key, cfg, dtype)


def _init_croco(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    ps = cfg.patch_size
    return {
        "patch_embed": init_patch_embed(keys[0], ps, 3, cfg.enc.dim, dtype),
        "enc_blocks": init_block_stack(keys[1], cfg.enc, dtype),
        "enc_norm": init_layer_norm(cfg.enc.dim, dtype),
        "decoder_embed": init_linear(keys[2], cfg.enc.dim, cfg.dec.dim, dtype=dtype),
        "dec_blocks": init_decoder_block_stack(keys[3], cfg.dec, dtype),
        "dec_norm": init_layer_norm(cfg.dec.dim, dtype),
        "mask_token": jax.random.normal(keys[4], (1, 1, cfg.dec.dim), dtype) * 0.02,
        "prediction_head": init_linear(keys[5], cfg.dec.dim, ps * ps * 3, dtype=dtype),
    }


_init_croco_jitted = jax.jit(_init_croco, static_argnums=(1, 2))


def random_mask(rng: jax.Array, batch: int, num_patches: int,
                mask_ratio: float) -> jax.Array:
    """(B, N) bool, exactly int(ratio*N) True per row (ref masking.py:12-25)."""
    num_mask = int(mask_ratio * num_patches)
    noise = jax.random.uniform(rng, (batch, num_patches))
    return jnp.argsort(jnp.argsort(noise, axis=1), axis=1) < num_mask


def patchify(imgs: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, ps*ps*3) in the reference's channel-last
    per-patch layout (ref croco.py:203-216)."""
    b, h, w, c = imgs.shape
    p = patch_size
    x = imgs.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x: jax.Array, patch_size: int, h: int, w: int) -> jax.Array:
    """(B, N, ps*ps*C) -> (B, h, w, C); inverse of patchify
    (ref croco.py:218-229, which assumes a square grid — we take h, w)."""
    b, n, d = x.shape
    p = patch_size
    gh, gw = h // p, w // p
    assert n == gh * gw, (n, gh, gw)
    c = d // (p * p)
    x = x.reshape(b, gh, gw, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def croco_forward(params, img1: jax.Array, img2: jax.Array, mask: jax.Array,
                  cfg: DUSt3RConfig, mask_ratio: float = 0.9,
                  prec: Precision = BF16
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked cross-view completion (ref croco.py:231-249).

    img1/img2: (B, H, W, 3); mask: (B, N) bool from random_mask(mask_ratio)
    — exactly int(mask_ratio*N) masked per row, so the visible width is
    static.  Returns (pred (B, N, ps²·3), mask, target); the loss selects
    the masked patches.
    """
    b, h, w, _ = img1.shape
    n_patches = int(mask.shape[1])
    n_vis = n_patches - int(mask_ratio * n_patches)  # static
    # n_vis is static (from mask_ratio), so a mask built with a DIFFERENT
    # ratio would silently gather the wrong token count; validate whenever
    # the mask is concrete.  np.asarray raises on tracers (no internal-API
    # Tracer check); the host fetch is (B, N) bools — tiny — and skippable
    # via SPANN3R_SKIP_MASK_CHECK=1 for hot eager loops.
    import os as _os
    import numpy as _np
    counts = None
    if not _os.environ.get("SPANN3R_SKIP_MASK_CHECK"):
        try:
            counts = _np.asarray(mask).sum(axis=1)
        except Exception:  # abstract tracer under jit — shapes checked by jax
            counts = None
    if counts is not None:
        if not (counts == n_patches - n_vis).all():
            raise ValueError(
                f"mask rows carry {sorted(set(counts.tolist()))} masked "
                f"tokens but mask_ratio={mask_ratio} implies "
                f"{n_patches - n_vis}; build the mask with random_mask(..., "
                f"mask_ratio) matching this argument")

    # 'cosine' positional mode (the CroCoNet default, ref croco.py:48-59):
    # absolute sincos embeds added at the encoder and decoder inputs; with
    # RoPE (rope_base > 0) nothing is added, matching ref croco.py:57-59.
    use_cosine = cfg.enc.rope_base <= 0
    if use_cosine:
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        if gh != gw:
            raise ValueError("cosine pos_embed assumes a square patch grid "
                             f"(ref croco.py:50 uses sqrt(num_patches)); got "
                             f"{gh}x{gw} — use pos_embed='RoPE100' instead")
        enc_pe = get_2d_sincos_pos_embed(cfg.enc.dim, gh)[None]
        dec_pe = get_2d_sincos_pos_embed(cfg.dec.dim, gh)[None]

    # encode visible patches of img1 (gathered to a fixed width)
    x1, pos = patch_embed_apply(params["patch_embed"],
                                img1.astype(prec.compute_dtype), cfg.patch_size)
    if use_cosine:  # ref croco.py:140-141
        x1 = x1 + enc_pe.astype(x1.dtype)
    order = jnp.argsort(mask, axis=1)          # False (visible) first, stable
    vis_idx = order[:, :n_vis]                  # (B, N_vis)
    x1_vis = jnp.take_along_axis(x1, vis_idx[..., None], axis=1)
    pos_vis = jnp.take_along_axis(pos, vis_idx[..., None], axis=1)
    f1 = encoder_apply(params["enc_blocks"], x1_vis, pos_vis, cfg.enc)
    f1 = layer_norm(params["enc_norm"], f1, cfg.enc.ln_eps)

    # encode img2 fully
    x2, pos2 = patch_embed_apply(params["patch_embed"],
                                 img2.astype(prec.compute_dtype), cfg.patch_size)
    if use_cosine:
        x2 = x2 + enc_pe.astype(x2.dtype)
    f2 = encoder_apply(params["enc_blocks"], x2, pos2, cfg.enc)
    f2 = layer_norm(params["enc_norm"], f2, cfg.enc.ln_eps)

    # decoder: scatter visible tokens over mask tokens (ref croco.py:166-201)
    d1_vis = linear(params["decoder_embed"], f1)
    d2 = linear(params["decoder_embed"], f2)
    full = jnp.broadcast_to(params["mask_token"].astype(d1_vis.dtype),
                            (b, mask.shape[1], d1_vis.shape[-1]))
    d1 = full.at[jnp.arange(b)[:, None], vis_idx].set(d1_vis)
    if use_cosine:  # ref croco.py:185-187: added AFTER the scatter
        d1 = d1 + dec_pe.astype(d1.dtype)
        d2 = d2 + dec_pe.astype(d2.dtype)

    def body(carry, p):
        c1, c2 = carry
        n1 = decoder_block_apply(p, c1, c2, pos, pos2, cfg.dec)
        return (n1, c2), None

    (out, _), _ = jax.lax.scan(body, (d1, d2), params["dec_blocks"])
    out = layer_norm(params["dec_norm"], out, cfg.dec.ln_eps)

    pred = linear(params["prediction_head"], out.astype(jnp.float32))
    target = patchify(img1, cfg.patch_size)
    return pred, mask, target


def masked_mse(pred: jax.Array, mask: jax.Array, target: jax.Array,
               norm_pix_loss: bool = False, masked: bool = True) -> jax.Array:
    """MaskedMSE (ref croco/models/criterion.py:14-36)."""
    target = target.astype(jnp.float32)
    if norm_pix_loss:
        mean = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    loss = jnp.mean(jnp.square(pred - target), axis=-1)  # (B, N)
    if masked:
        m = mask.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.clip(jnp.sum(m), 1e-8)
    return jnp.mean(loss)

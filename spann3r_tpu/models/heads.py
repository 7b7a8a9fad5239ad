"""Pointmap regression heads: linear (pixel-shuffle) and DPT.

References: dust3r/heads/linear_head.py:30-41, dust3r/heads/dpt_head.py,
croco/models/dpt_block.py, dust3r/heads/postprocess.py:10-58.

Everything runs NHWC (TPU-native); heads are forced fp32 regardless of the
backbone compute dtype (ref spann3r/model.py:328, dust3r/model.py:220-222).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import DUSt3RConfig
from ..ops.layers import (conv2d, conv2d_transpose, init_conv2d, init_linear,
                          interpolate_bilinear, linear)


# ---------------------------------------------------------------------------
# postprocess (ref heads/postprocess.py)
# ---------------------------------------------------------------------------

def reg_dense_depth(xyz: jax.Array, mode: Tuple[str, float, float]) -> jax.Array:
    name, vmin, vmax = mode
    if name == "linear":
        return xyz
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = xyz / jnp.clip(d, 1e-8)
    if name == "square":
        return xyz * jnp.square(d)
    if name == "exp":
        return xyz * jnp.expm1(d)
    raise ValueError(f"bad depth mode {name}")


def reg_dense_conf(x: jax.Array, mode: Tuple[str, float, float]) -> jax.Array:
    name, vmin, vmax = mode
    if name == "exp":
        return vmin + jnp.clip(jnp.exp(x), max=vmax - vmin)
    if name == "sigmoid":
        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode {name}")


def postprocess(fmap: jax.Array, cfg: DUSt3RConfig) -> Dict[str, jax.Array]:
    """fmap: (B, H, W, 3+conf) NHWC -> {'pts3d': (B,H,W,3), 'conf': (B,H,W)}."""
    res = {"pts3d": reg_dense_depth(fmap[..., 0:3], cfg.depth_mode)}
    if fmap.shape[-1] > 3:
        res["conf"] = reg_dense_conf(fmap[..., 3], cfg.conf_mode)
    return res


# ---------------------------------------------------------------------------
# linear head
# ---------------------------------------------------------------------------

def linear_head_apply(p, dec_states: List[jax.Array], img_hw: Tuple[int, int],
                      cfg: DUSt3RConfig) -> Dict[str, jax.Array]:
    """Last decoder state -> per-token 16x16x(3+conf) patch via pixel shuffle."""
    h, w = img_hw
    ps = cfg.patch_size
    # dtype set by the caller (dust3r.downstream_head casts the states to
    # prec.head_dtype; linear()/conv2d() follow the activation dtype) —
    # fp32 by default, bf16 under the BF16_FAST serving opt-in
    tokens = dec_states[-1]
    feat = linear(p["proj"], tokens)  # (B, N, (3+c)*ps*ps)
    b, n, _ = feat.shape
    nh, nw = h // ps, w // ps
    c = cfg.out_channels
    # torch pixel_shuffle channel order: d = (chan*ps + i)*ps + j
    feat = feat.reshape(b, nh, nw, c, ps, ps)
    feat = feat.transpose(0, 1, 4, 2, 5, 3)  # (B, nh, i, nw, j, chan)
    fmap = feat.reshape(b, h, w, c)
    return postprocess(fmap, cfg)


def _damp(p, factor=0.01):
    """Scale down a layer's random init.

    Applied to the final head projection only: with the 'exp' depth mode
    (pts = xyz/|xyz| * expm1(|xyz|)), full-width random init can emit
    |xyz| > 88 whose expm1 overflows and NaNs from-scratch training within
    a few steps (the reference always warm-starts from DUSt3R and simply
    sys.exits on non-finite loss, training.py:222-224).  Checkpoint loading
    overwrites this, so parity is unaffected."""
    return {"w": p["w"] * factor, "b": p.get("b")}


def init_linear_head(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    ps = cfg.patch_size
    return {"proj": _damp(init_linear(key, cfg.dec.dim,
                                      cfg.out_channels * ps * ps, dtype=dtype))}


# ---------------------------------------------------------------------------
# DPT head (ref croco/models/dpt_block.py + dust3r/heads/dpt_head.py fix)
# ---------------------------------------------------------------------------

def _residual_conv_unit(p, x: jax.Array) -> jax.Array:
    out = conv2d(p["conv1"], jax.nn.relu(x), padding=[(1, 1), (1, 1)])
    out = conv2d(p["conv2"], jax.nn.relu(out), padding=[(1, 1), (1, 1)])
    return out + x


def _fusion_block(p, x: jax.Array, skip: jax.Array | None) -> jax.Array:
    """FeatureFusionBlock_custom, width_ratio=1 (ref dpt_block.py:189-218)."""
    out = x
    if skip is not None:
        out = out + _residual_conv_unit(p["res1"], skip)
    out = _residual_conv_unit(p["res2"], out)
    out = interpolate_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2),
                               align_corners=True)
    return conv2d(p["out_conv"], out, padding="VALID")


def dpt_head_apply(p, dec_states: List[jax.Array], img_hw: Tuple[int, int],
                   cfg: DUSt3RConfig) -> Dict[str, jax.Array]:
    """dec_states: 13 hook states (B, N, C); returns postprocessed pointmap."""
    h, w = img_hw
    nh, nw = h // cfg.patch_size, w // cfg.patch_size
    hooks = cfg.dpt_hooks

    maps = []
    for i, hook in enumerate(hooks):
        # dtype set by the caller (dust3r.downstream_head casts to
        # prec.head_dtype; convs follow the activation dtype): fp32 by
        # default, bf16 under the BF16_FAST serving opt-in
        t = dec_states[hook]
        b, n, c = t.shape
        maps.append(t.reshape(b, nh, nw, c))

    # per-level reassembly (act_postprocess, ref dpt_block.py:356-410)
    l0 = conv2d(p["act0_conv"], maps[0], padding="VALID")
    l0 = conv2d_transpose(p["act0_deconv"], l0, stride=4)
    l1 = conv2d(p["act1_conv"], maps[1], padding="VALID")
    l1 = conv2d_transpose(p["act1_deconv"], l1, stride=2)
    l2 = conv2d(p["act2_conv"], maps[2], padding="VALID")
    l3 = conv2d(p["act3_conv"], maps[3], padding="VALID")
    l3 = conv2d(p["act3_conv2"], l3, stride=2, padding=[(1, 1), (1, 1)])

    # project to common feature dim (layer_rn, 3x3 no-bias)
    r0 = conv2d(p["rn0"], l0, padding=[(1, 1), (1, 1)])
    r1 = conv2d(p["rn1"], l1, padding=[(1, 1), (1, 1)])
    r2 = conv2d(p["rn2"], l2, padding=[(1, 1), (1, 1)])
    r3 = conv2d(p["rn3"], l3, padding=[(1, 1), (1, 1)])

    # refinement cascade; crop path4 to r2's dims (ref dust3r dpt_head.py:57)
    path4 = _fusion_block(p["refine4"], r3, None)[:, :r2.shape[1], :r2.shape[2]]
    path3 = _fusion_block(p["refine3"], path4, r2)
    path2 = _fusion_block(p["refine2"], path3, r1)
    path1 = _fusion_block(p["refine1"], path2, r0)

    # regression head (ref dpt_block.py:316-324)
    out = conv2d(p["head_conv1"], path1, padding=[(1, 1), (1, 1)])
    out = interpolate_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2),
                               align_corners=True)
    out = conv2d(p["head_conv2"], out, padding=[(1, 1), (1, 1)])
    out = jax.nn.relu(out)
    fmap = conv2d(p["head_conv3"], out, padding="VALID")
    return postprocess(fmap, cfg)


def init_dpt_head(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 24))
    ld = cfg.dpt_layer_dims
    hd = cfg.dpt_hook_dims
    fd = cfg.dpt_feature_dim

    def rcu(k):
        k1, k2 = jax.random.split(k)
        return {"conv1": init_conv2d(k1, 3, 3, fd, fd, dtype=dtype),
                "conv2": init_conv2d(k2, 3, 3, fd, fd, dtype=dtype)}

    def fusion(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"res1": rcu(k1), "res2": rcu(k2),
                "out_conv": init_conv2d(k3, 1, 1, fd, fd, dtype=dtype)}

    return {
        "act0_conv": init_conv2d(next(keys), 1, 1, hd[0], ld[0], dtype=dtype),
        "act0_deconv": init_conv2d(next(keys), 4, 4, ld[0], ld[0], dtype=dtype),
        "act1_conv": init_conv2d(next(keys), 1, 1, hd[1], ld[1], dtype=dtype),
        "act1_deconv": init_conv2d(next(keys), 2, 2, ld[1], ld[1], dtype=dtype),
        "act2_conv": init_conv2d(next(keys), 1, 1, hd[2], ld[2], dtype=dtype),
        "act3_conv": init_conv2d(next(keys), 1, 1, hd[3], ld[3], dtype=dtype),
        "act3_conv2": init_conv2d(next(keys), 3, 3, ld[3], ld[3], dtype=dtype),
        "rn0": init_conv2d(next(keys), 3, 3, ld[0], fd, bias=False, dtype=dtype),
        "rn1": init_conv2d(next(keys), 3, 3, ld[1], fd, bias=False, dtype=dtype),
        "rn2": init_conv2d(next(keys), 3, 3, ld[2], fd, bias=False, dtype=dtype),
        "rn3": init_conv2d(next(keys), 3, 3, ld[3], fd, bias=False, dtype=dtype),
        "refine1": fusion(next(keys)),
        "refine2": fusion(next(keys)),
        "refine3": fusion(next(keys)),
        "refine4": fusion(next(keys)),
        "head_conv1": init_conv2d(next(keys), 3, 3, fd, fd // 2, dtype=dtype),
        "head_conv2": init_conv2d(next(keys), 3, 3, fd // 2, cfg.dpt_last_dim, dtype=dtype),
        "head_conv3": _damp(init_conv2d(next(keys), 1, 1, cfg.dpt_last_dim,
                                        cfg.out_channels, dtype=dtype)),
    }


def head_apply(p, dec_states, img_hw, cfg: DUSt3RConfig):
    if cfg.head_type == "dpt":
        return dpt_head_apply(p, dec_states, img_hw, cfg)
    return linear_head_apply(p, dec_states, img_hw, cfg)


def init_head(key, cfg: DUSt3RConfig, dtype=jnp.float32):
    if cfg.head_type == "dpt":
        return init_dpt_head(key, cfg, dtype)
    return init_linear_head(key, cfg, dtype)

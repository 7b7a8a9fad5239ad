"""Pixelwise DPT task head for stereo/flow finetuning.

Reference: croco/models/head_downstream.py:19-58 (PixelwiseTaskWithDPT)
driving croco/models/dpt_block.py:264-450 (DPTOutputAdapter, regression
head).  The reassembly + refinement cascade is the same DPT machinery the
dust3r pointmap head uses (models/heads.py cites dpt_block.py line by
line); here it is parameterized for an arbitrary channel count, takes the
concatenated [encoder states..., decoder states...] hook list of the
binocular/monocular downstream forwards, and returns the RAW (B, H, W, C)
map — no pointmap postprocess (the reference head has postprocess=None,
stereoflow/train.py:118-121).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import DUSt3RConfig
from ..ops.layers import (conv2d, conv2d_transpose, init_conv2d,
                          interpolate_bilinear)
from ..models.heads import _fusion_block
from ..models.croco_downstream import dpt_hook_indices


def init_pixelwise_dpt(key, cfg: DUSt3RConfig, num_channels: int,
                       hooks: Sequence[int] = None,
                       layer_dims: Sequence[int] = (96, 192, 384, 768),
                       feature_dim: int = 256, last_dim: int = 32,
                       encoder_only: bool = False, dtype=jnp.float32):
    """Build the head param pytree.  `hooks` defaults to the reference's
    automatic placement (head_downstream.py:38-46): last encoder state +
    3 equally spread decoder states (or 4 encoder states when
    encoder_only).  Token dims per hook follow head_downstream.py:50."""
    if hooks is None:
        hooks = dpt_hook_indices(cfg.enc.depth,
                                 None if encoder_only else cfg.dec.depth)
    hooks = list(hooks)
    hook_dims = [cfg.enc.dim if h < cfg.enc.depth else cfg.dec.dim
                 for h in hooks]
    ld = list(layer_dims)
    keys = iter(jax.random.split(key, 24))

    def rcu(k):
        k1, k2 = jax.random.split(k)
        return {"conv1": init_conv2d(k1, 3, 3, feature_dim, feature_dim,
                                     dtype=dtype),
                "conv2": init_conv2d(k2, 3, 3, feature_dim, feature_dim,
                                     dtype=dtype)}

    def fusion(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"res1": rcu(k1), "res2": rcu(k2),
                "out_conv": init_conv2d(k3, 1, 1, feature_dim, feature_dim,
                                        dtype=dtype)}

    p = {
        # act_postprocess reassembly (dpt_block.py:356-410)
        "act0_conv": init_conv2d(next(keys), 1, 1, hook_dims[0], ld[0],
                                 dtype=dtype),
        "act0_deconv": init_conv2d(next(keys), 4, 4, ld[0], ld[0],
                                   dtype=dtype),
        "act1_conv": init_conv2d(next(keys), 1, 1, hook_dims[1], ld[1],
                                 dtype=dtype),
        "act1_deconv": init_conv2d(next(keys), 2, 2, ld[1], ld[1],
                                   dtype=dtype),
        "act2_conv": init_conv2d(next(keys), 1, 1, hook_dims[2], ld[2],
                                 dtype=dtype),
        "act3_conv": init_conv2d(next(keys), 1, 1, hook_dims[3], ld[3],
                                 dtype=dtype),
        "act3_conv2": init_conv2d(next(keys), 3, 3, ld[3], ld[3],
                                  dtype=dtype),
        # scratch.layer_rn 3x3 no-bias projections (dpt_block.py:42-66)
        "rn0": init_conv2d(next(keys), 3, 3, ld[0], feature_dim, bias=False,
                           dtype=dtype),
        "rn1": init_conv2d(next(keys), 3, 3, ld[1], feature_dim, bias=False,
                           dtype=dtype),
        "rn2": init_conv2d(next(keys), 3, 3, ld[2], feature_dim, bias=False,
                           dtype=dtype),
        "rn3": init_conv2d(next(keys), 3, 3, ld[3], feature_dim, bias=False,
                           dtype=dtype),
        "refine1": fusion(next(keys)),
        "refine2": fusion(next(keys)),
        "refine3": fusion(next(keys)),
        "refine4": fusion(next(keys)),
        # "DPTDepthModel" regression head (dpt_block.py:316-324)
        "head_conv1": init_conv2d(next(keys), 3, 3, feature_dim,
                                  feature_dim // 2, dtype=dtype),
        "head_conv2": init_conv2d(next(keys), 3, 3, feature_dim // 2,
                                  last_dim, dtype=dtype),
        "head_conv3": init_conv2d(next(keys), 1, 1, last_dim, num_channels,
                                  dtype=dtype),
    }
    return p, hooks


def pixelwise_dpt_apply(p, states: List[jax.Array],
                        img_hw: Tuple[int, int], hooks: Sequence[int],
                        patch_size: int) -> jax.Array:
    """states: all-blocks hook list (each (B, N, C)); returns the raw
    regression map (B, H, W, num_channels) in fp32.  Cascade mirrors
    DPTOutputAdapter.forward (dpt_block.py:419-450); the refinenet4 crop of
    the dust3r variant is a no-op here because every grid dim is a patch
    multiple, kept for parity with models/heads.py."""
    h, w = img_hw
    nh, nw = h // patch_size, w // patch_size

    maps = []
    for hook in hooks:
        t = states[hook].astype(jnp.float32)
        b, n, c = t.shape
        maps.append(t.reshape(b, nh, nw, c))

    l0 = conv2d(p["act0_conv"], maps[0], padding="VALID")
    l0 = conv2d_transpose(p["act0_deconv"], l0, stride=4)
    l1 = conv2d(p["act1_conv"], maps[1], padding="VALID")
    l1 = conv2d_transpose(p["act1_deconv"], l1, stride=2)
    l2 = conv2d(p["act2_conv"], maps[2], padding="VALID")
    l3 = conv2d(p["act3_conv"], maps[3], padding="VALID")
    l3 = conv2d(p["act3_conv2"], l3, stride=2, padding=[(1, 1), (1, 1)])

    r0 = conv2d(p["rn0"], l0, padding=[(1, 1), (1, 1)])
    r1 = conv2d(p["rn1"], l1, padding=[(1, 1), (1, 1)])
    r2 = conv2d(p["rn2"], l2, padding=[(1, 1), (1, 1)])
    r3 = conv2d(p["rn3"], l3, padding=[(1, 1), (1, 1)])

    path4 = _fusion_block(p["refine4"], r3, None)[:, :r2.shape[1],
                                                  :r2.shape[2]]
    path3 = _fusion_block(p["refine3"], path4, r2)
    path2 = _fusion_block(p["refine2"], path3, r1)
    path1 = _fusion_block(p["refine1"], path2, r0)

    out = conv2d(p["head_conv1"], path1, padding=[(1, 1), (1, 1)])
    out = interpolate_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2),
                               align_corners=True)
    out = conv2d(p["head_conv2"], out, padding=[(1, 1), (1, 1)])
    out = jax.nn.relu(out)
    return conv2d(p["head_conv3"], out, padding="VALID")

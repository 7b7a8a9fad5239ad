"""Model/config dataclasses for the TPU-native Spann3R rebuild.

The shapes mirror the reference checkpoints' architecture (see
/root/reference dust3r/model.py:36-47 model-string and croco/models/croco.py:23-37
defaults) but the implementation here is an independent JAX/XLA design.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """One transformer stack (encoder or decoder side)."""
    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    rope_base: float = 100.0  # RoPE100; <=0 disables rope

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class DUSt3RConfig:
    """Two-view pointmap backbone (ref: dust3r/model.py:54, croco/models/croco.py:21).

    Default values reproduce the published 512-dpt checkpoint architecture:
    ViT-Large encoder, dual ViT-Base-ish decoders, DPT head.
    """
    img_size: Tuple[int, int] = (512, 512)  # max supported (H, W); actual inputs any mult of 16
    patch_size: int = 16
    enc: ViTConfig = ViTConfig(dim=1024, depth=24, num_heads=16)
    dec: ViTConfig = ViTConfig(dim=768, depth=12, num_heads=12)
    head_type: str = "dpt"          # 'dpt' | 'linear'
    depth_mode: Tuple[str, float, float] = ("exp", -float("inf"), float("inf"))
    conf_mode: Tuple[str, float, float] = ("exp", 1.0, float("inf"))
    # DPT head dims (ref: dust3r/heads/dpt_head.py:96-115)
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dpt_layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    out_channels: int = 4           # 3 xyz + 1 conf

    @property
    def dpt_hooks(self) -> Tuple[int, int, int, int]:
        # ref: dust3r/heads/dpt_head.py:110 — hooks over the 13 collected decoder states
        d = self.dec.depth
        return (0, d * 2 // 4, d * 3 // 4, d)

    @property
    def dpt_hook_dims(self) -> Tuple[int, int, int, int]:
        return (self.enc.dim, self.dec.dim, self.dec.dim, self.dec.dim)


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    """Spatial memory hyper-params (ref: spann3r/model.py:11-40)."""
    long_mem_size: int = 4000
    work_mem_size: int = 5
    attn_thresh: float = 5e-4
    sim_thresh: float = 0.95
    # age (in frames) below which slots are protected from pruning;
    # None derives work_mem_size + 5 (the reference's hard-coded rule,
    # spann3r/model.py:188)
    prune_protect_age: Optional[int] = None
    mem_dropout: float = 0.15

    @property
    def protect_age(self) -> int:
        if self.prune_protect_age is not None:
            return self.prune_protect_age
        return self.work_mem_size + 5

    def capacity(self, num_patches: int) -> int:
        """Static token capacity of the bank.

        Bank size right before a prune is bounded by
        long_mem_size + (work_mem_size + 1) * P; round up to a multiple of 128
        lanes for TPU-friendly layouts.
        """
        cap = self.long_mem_size + (self.work_mem_size + 1) * num_patches
        return -(-cap // 128) * 128


@dataclasses.dataclass(frozen=True)
class Spann3RConfig:
    dust3r: DUSt3RConfig = DUSt3RConfig()
    memory: MemoryConfig = MemoryConfig()
    # memory value encoder: 6 blocks at dim 1024 (ref: spann3r/model.py:228-242)
    value_enc_depth: int = 6
    value_enc_dim: int = 1024
    value_enc_heads: int = 16
    use_feat: bool = False          # if True, value = decoder feats (dim 768)
    mem_pos_enc: bool = False
    # attn-head MLPs: (1024+768) -> same -> 1024 (ref: spann3r/model.py:250-261)
    attn_head_in: int = 1024 + 768
    attn_head_out: int = 1024

    @property
    def value_in_dim(self) -> int:
        return 768 if self.use_feat else 1024


# Numeric policy: params live in fp32; transformer compute in bf16 on TPU;
# heads and losses forced fp32 (matches reference AMP policy,
# spann3r/model.py:328, dust3r/model.py:220).
@dataclasses.dataclass(frozen=True)
class Precision:
    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32


FP32 = Precision(compute_dtype=jnp.float32, head_dtype=jnp.float32)
BF16 = Precision(compute_dtype=jnp.bfloat16, head_dtype=jnp.float32)
# serving mode: bf16 everywhere incl. the DPT conv stack
BF16_FAST = Precision(compute_dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)


def dust3r_224_linear() -> DUSt3RConfig:
    """Architecture of the 224-res linear-head checkpoint."""
    return DUSt3RConfig(img_size=(224, 224), head_type="linear")


def dust3r_512_dpt() -> DUSt3RConfig:
    return DUSt3RConfig(img_size=(512, 512), head_type="dpt")

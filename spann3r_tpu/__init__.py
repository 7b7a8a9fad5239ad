"""spann3r_tpu — TPU-native incremental dense 3D reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HengyiWang/spann3r (Spann3R, arXiv 2408.16061): DUSt3R two-view pointmap
regression wrapped in a spatial memory for streaming multi-frame
reconstruction, plus training, evaluation and serving stacks.

Quick start::

    from spann3r_tpu import Spann3RConfig, reconstruct_video
    from spann3r_tpu.utils.torch_ckpt import load_spann3r_checkpoint

    cfg = Spann3RConfig()
    params = load_spann3r_checkpoint("spann3r.pth", cfg)
    preds, order, fps = reconstruct_video(params, cfg, frames)  # (T,1,H,W,3)
"""
__version__ = "0.1.0"

from .api import reconstruct_video
from .config import (BF16, BF16_FAST, FP32, DUSt3RConfig, MemoryConfig,
                     Precision, Spann3RConfig)

__all__ = [
    "reconstruct_video", "Spann3RConfig", "DUSt3RConfig", "MemoryConfig",
    "Precision", "BF16", "BF16_FAST", "FP32",
]

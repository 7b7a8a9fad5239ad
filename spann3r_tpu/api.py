"""High-level reconstruction API shared by demo.py / eval.py."""
from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np

from .config import BF16, Precision, Spann3RConfig


def reconstruct_video(params, cfg: Spann3RConfig, frames: np.ndarray,
                      prec: Precision = BF16, offline: bool = False,
                      scene_graph: str = "complete", chunk: int = 16
                      ) -> Tuple[List[Dict], List[int], float]:
    """frames: (T, B, H, W, 3) -> (preds list, frame order, fps).

    Online mode runs the chunked on-device scan (supports B independent
    streams with per-stream memory); offline mode runs the pairwise-conf +
    greedy next-best-view pipeline (single stream only).  `preds` follows
    the reference contract (ref spann3r/model.py:523-534): preds[0] has
    'pts3d', the rest 'pts3d_in_other_view', all in frame-0 coordinates.

    Note: fps includes first-call jit compilation (the reference's eager
    timing has no compile step); bench.py measures steady state.
    """
    from .models import spann3r as sp

    hw = frames.shape[2:4]
    t0 = time.time()
    if offline:
        if frames.shape[1] != 1:
            raise ValueError("offline reconstruction is single-stream; got "
                             f"B={frames.shape[1]}")
        from .models.offline import offline_reconstruction_fused
        preds, _, idx_used = offline_reconstruction_fused(
            params, frames[:, 0], cfg, hw, scene_graph=scene_graph, prec=prec)
        order = idx_used
    else:
        engine = sp.InferenceEngine(params, cfg, hw, prec,
                                    batch=frames.shape[1])
        preds = engine.run_video(frames, chunk=min(chunk, frames.shape[0]))
        order = list(range(frames.shape[0]))
    elapsed = time.time() - t0
    return preds, order, frames.shape[0] / max(elapsed, 1e-9)

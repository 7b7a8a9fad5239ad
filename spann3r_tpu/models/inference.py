"""Public pairwise inference API (rebuild of dust3r/inference.py:62-78).

`inference(pairs, params, cfg)` runs batched symmetric two-view forwards
over a pair list and collates the results — the building block for offline
reconstruction and standalone DUSt3R use.

TPU notes: all pairs share one compiled program per (batch, resolution);
frames are encoded once (dict-cached) rather than per-pair.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BF16, DUSt3RConfig, Precision
from . import dust3r as d3


# params passed as traced args (NOT closed over) so weights are not baked
# into the executable as constants and programs are reused across calls
@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_jit(params, imgs, cfg, prec):
    return d3.encode_image(params, imgs, cfg, prec)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _decode_jit(params, f1, f2, pos1, hw, cfg, prec):
    b, p_tokens, _ = f1.shape
    pp = jnp.broadcast_to(pos1, (b, p_tokens, 2))
    dec1, dec2 = d3.decoder(params, f1, pp, f2, pp, cfg, prec)
    r1 = d3.downstream_head(params, 1, dec1, hw, cfg, prec)
    r2 = d3.downstream_head(params, 2, dec2, hw, cfg, prec)
    return r1, r2


def inference(pairs: Sequence[Tuple[dict, dict]], params, cfg: DUSt3RConfig,
              batch_size: int = 8, prec: Precision = BF16,
              verbose: bool = True) -> Dict:
    """pairs: [(view1, view2), ...] with view = {'img': (1,H,W,3), 'idx': i}.

    Returns {'view1': {'idx': [...]}, 'view2': ..., 'pred1': {'pts3d', 'conf'},
    'pred2': {'pts3d_in_other_view', 'conf'}} with stacked numpy arrays —
    the reference's output contract (dust3r/inference.py:62-78).
    """
    if verbose:
        print(f">> Inference with model on {len(pairs)} image pairs")

    # encode every unique frame once
    frames = {}
    for v1, v2 in pairs:
        for v in (v1, v2):
            frames.setdefault(int(v["idx"]), np.asarray(v["img"]))
    idxs = sorted(frames)
    imgs = jnp.asarray(np.concatenate([frames[i] for i in idxs], axis=0))
    feats, pos = _encode_jit(params, imgs, cfg, prec)
    feat_of = {i: feats[k] for k, i in enumerate(idxs)}
    hw = imgs.shape[1:3]

    def decode_batch(f1, f2):
        return _decode_jit(params, f1, f2, pos[:1], hw, cfg, prec)

    n = len(pairs)
    pts1 = np.empty((n, *hw, 3), np.float32)
    conf1 = np.empty((n, *hw), np.float32)
    pts2 = np.empty((n, *hw, 3), np.float32)
    conf2 = np.empty((n, *hw), np.float32)
    i1_all, i2_all = [], []

    s = 0
    while s < n:
        chunk = pairs[s:s + batch_size]
        pad = batch_size - len(chunk)
        padded = list(chunk) + [chunk[-1]] * pad
        f1 = jnp.stack([feat_of[int(a["idx"])] for a, _ in padded])
        f2 = jnp.stack([feat_of[int(b["idx"])] for _, b in padded])
        r1, r2 = decode_batch(f1, f2)
        k = len(chunk)
        pts1[s:s + k] = np.asarray(r1["pts3d"], np.float32)[:k]
        conf1[s:s + k] = np.asarray(r1["conf"], np.float32)[:k]
        pts2[s:s + k] = np.asarray(r2["pts3d"], np.float32)[:k]
        conf2[s:s + k] = np.asarray(r2["conf"], np.float32)[:k]
        i1_all += [int(a["idx"]) for a, _ in chunk]
        i2_all += [int(b["idx"]) for _, b in chunk]
        s += k

    return {
        "view1": {"idx": i1_all},
        "view2": {"idx": i2_all},
        "pred1": {"pts3d": pts1, "conf": conf1},
        "pred2": {"pts3d_in_other_view": pts2, "conf": conf2},
    }

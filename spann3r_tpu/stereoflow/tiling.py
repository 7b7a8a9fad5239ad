"""Tiled high-resolution inference with confidence-weighted aggregation.

Reference: croco/stereoflow/engine.py:178-279 (tiled_pred, _overlapping,
_crop).  The reference loops tile-by-tile through the model; here all
tiles are gathered into one batch and pushed through the jitted model in
fixed-size chunks (one compiled program shape, MXU-friendly), then
aggregated on host.  Numbers match the reference tile-for-tile: the
weighting formula, linspace offsets, and upscale path are identical.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_slices(total: int, window: int, overlap: float = 0.5):
    """ref engine.py:268-271 (_overlapping): linspace-rounded offsets."""
    assert total >= window and 0 <= overlap < 1, (total, window, overlap)
    num_windows = 1 + int(np.ceil((total - window) / ((1 - overlap) * window)))
    offsets = np.linspace(0, total - window, num_windows).round().astype(int)
    return [slice(int(x), int(x) + window) for x in offsets]


def _conf_weight(predconf: np.ndarray, conf_mode: str) -> np.ndarray:
    """Tile weight from the raw confidence channel (ref engine.py:205-211,
    237-242)."""
    if conf_mode.startswith("conf_expsigmoid_"):  # e.g. conf_expsigmoid_10_5
        beta, betasigmoid = map(
            float, conf_mode[len("conf_expsigmoid_"):].split("_"))
        sig = 1.0 / (1.0 + np.exp(-predconf / betasigmoid))
        return np.exp(-beta * 2 * (sig - 0.5))
    if conf_mode.startswith("conf_expbeta"):  # e.g. conf_expbeta3
        beta = float(conf_mode[len("conf_expbeta"):])
        return np.exp(-beta * predconf)
    raise NotImplementedError(f"conf_mode {conf_mode} is not implemented")


def _resize_img(img: np.ndarray, new_hw) -> np.ndarray:
    """Bicubic resize, NHWC (ref engine.py:163-164; jax bicubic kernel
    a=-0.5 vs torch a=-0.75 — sub-1% differences only on the rare
    upscale-smaller-than-crop path)."""
    b, _, _, c = img.shape
    return np.array(jax.image.resize(
        jnp.asarray(img), (b, new_hw[0], new_hw[1], c), method="bicubic"))


def resize_stereo_or_flow(data: np.ndarray, new_hw) -> np.ndarray:
    """Resize gt/pred maps and rescale the displacement values
    (ref engine.py:165-175)."""
    assert data.ndim == 4 and data.shape[-1] in (1, 2)
    scale_x = new_hw[1] / float(data.shape[2])
    out = _resize_img(data, new_hw)
    out[..., 0] *= scale_x
    if out.shape[-1] == 2:
        out[..., 1] *= new_hw[0] / float(data.shape[1])
    return out


def tiled_pred(model_fn: Callable, criterion, img1: np.ndarray,
               img2: np.ndarray, gt: Optional[np.ndarray],
               crop: Tuple[int, int] = (352, 704), overlap: float = 0.5,
               conf_mode: str = "conf_expsigmoid_10_5",
               with_conf: bool = False, num_channels: int = None,
               tile_batch: int = 8):
    """Weighted-average overlapping-tile inference (ref engine.py:178-266).

    model_fn: jit-compiled (img1, img2) -> (B, win_h, win_w, C[+1]) NHWC.
    Returns (pred (B,H,W,C), mean tiled loss (None if gt/criterion absent),
    c (B,H,W) aggregated raw confidence).  Tiles are batched into chunks of
    `tile_batch` windows per dispatch instead of the reference's
    one-model-call-per-tile loop."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    B, H, W, _ = img1.shape
    if gt is not None:
        C = gt.shape[-1]
    else:
        assert num_channels is not None, "need num_channels when gt is None"
        C = num_channels
    win_h, win_w = crop

    # upscale when the image is smaller than one tile (engine.py:196-204).
    # DEVIATION: the reference computes max(win_w/W, win_h/W) — W in both
    # ratios — so a short-H image can stay below win_h and crash in
    # _overlapping; this uses the evidently intended win_h/H (identical
    # whenever the reference works at all).
    do_change_scale = H < win_h or W < win_w
    if do_change_scale:
        upscale = max(win_w / W, win_h / H)
        original_hw = (H, W)
        new_hw = (round(H * upscale), round(W * upscale))
        img1 = _resize_img(img1, new_hw)
        img2 = _resize_img(img2, new_hw)
        if gt is not None:
            gt = resize_stereo_or_flow(np.array(gt, copy=True), new_hw)
        H, W = new_hw

    sy_list = tile_slices(H, win_h, overlap)
    sx_list = tile_slices(W, win_w, overlap)
    tiles = [(sy, sx) for sy in sy_list for sx in sx_list]
    T = len(tiles)

    crops1 = np.stack([img1[:, sy, sx] for sy, sx in tiles])  # (T,B,h,w,3)
    crops2 = np.stack([img2[:, sy, sx] for sy, sx in tiles])
    flat1 = crops1.reshape(T * B, win_h, win_w, 3)
    flat2 = crops2.reshape(T * B, win_h, win_w, 3)

    # fixed-shape chunked dispatch (pad the tail with repeats)
    n = T * B
    outs = []
    for s in range(0, n, tile_batch):
        a1, a2 = flat1[s:s + tile_batch], flat2[s:s + tile_batch]
        pad = tile_batch - a1.shape[0]
        if pad:
            a1 = np.concatenate([a1, np.repeat(a1[-1:], pad, 0)])
            a2 = np.concatenate([a2, np.repeat(a2[-1:], pad, 0)])
        o = np.asarray(model_fn(a1, a2))
        outs.append(o[:o.shape[0] - pad] if pad else o)
    out = np.concatenate(outs).reshape(T, B, win_h, win_w, -1)
    pred_tiles = out[..., :C]
    conf_tiles = out[..., C] if with_conf else None

    accu_pred = np.zeros((B, H, W, C), np.float32)
    accu_w = np.full((B, H, W), 1e-16, np.float32)
    accu_c = np.zeros((B, H, W), np.float32)
    tiled_losses = []
    for t, (sy, sx) in enumerate(tiles):
        if criterion is not None and gt is not None:
            gtcrop = gt[:, sy, sx]
            if with_conf:
                tl = criterion(pred_tiles[t], gtcrop, conf_tiles[t])
            else:
                tl = criterion(pred_tiles[t], gtcrop)
            tiled_losses.append(float(tl))
        w = (_conf_weight(conf_tiles[t], conf_mode) if with_conf
             else np.ones((B, win_h, win_w), np.float32))
        accu_pred[:, sy, sx] += pred_tiles[t] * w[..., None]
        accu_w[:, sy, sx] += w
        if with_conf:
            accu_c[:, sy, sx] += conf_tiles[t] * w

    pred = accu_pred / accu_w[..., None]
    c = accu_c / accu_w
    assert not np.any(np.isnan(pred))

    if do_change_scale:
        pred = resize_stereo_or_flow(pred, original_hw)

    loss = float(np.mean(tiled_losses)) if tiled_losses else None
    return pred, loss, c

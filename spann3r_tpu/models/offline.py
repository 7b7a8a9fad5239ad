"""Offline reconstruction: pairwise conf scan + greedy next-best-view.

TPU re-design of the reference offline mode (spann3r/model.py:333-471 +
dust3r/inference.py:62-78):
  - all frames encoded ONCE in a batched pass (the reference re-encodes
    inside every pairwise forward)
  - the O(N^2) pairwise confidence matrix comes from batched two-view
    decodes over pair chunks
  - the greedy loop decodes ALL candidate frames per step in one batched
    decoder call with static shapes (the reference loops per candidate) and
    picks the argmax mean sigmoid-confidence
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BF16, Precision, Spann3RConfig
from . import dust3r as d3
from .memory import add_mem_check, init_memory, memory_read
from .pairs import make_pairs
from .spann3r import _memory_norms, pair_step


# module-level jits with params as traced args — weights are not baked into
# the executables and programs are shared across offline_reconstruction calls
@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _decode_conf_jit(params, f1, f2, pos1, img_hw, dcfg, prec):
    b, p_tokens, _ = f1.shape
    pp = jnp.broadcast_to(pos1, (b, p_tokens, 2))
    dec1, dec2 = d3.decoder(params, f1, pp, f2, pp, dcfg, prec)
    r1 = d3.downstream_head(params, 1, dec1, img_hw, dcfg, prec)
    r2 = d3.downstream_head(params, 2, dec2, img_hw, dcfg, prec)
    return _conf_sig_mean(r1["conf"]) + _conf_sig_mean(r2["conf"])


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _pair_jit(params, feat_fuse, f1, f2, pos, cfg, img_hw, prec):
    return pair_step(params, cfg, feat_fuse, f1, f2, pos, img_hw, prec)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _score_all_jit(params, feat_fuse, all_feats, pos, n, cfg, img_hw, prec):
    dcfg = cfg.dust3r
    p_tokens = pos.shape[1]
    ff = jnp.broadcast_to(feat_fuse, (n, p_tokens, feat_fuse.shape[-1]))
    pp = jnp.broadcast_to(pos, (n, p_tokens, 2))
    dec1, dec2 = d3.decoder(params["dust3r"], ff, pp, all_feats, pp, dcfg, prec)
    r1 = d3.downstream_head(params["dust3r"], 1, dec1, img_hw, dcfg, prec)
    r2 = d3.downstream_head(params["dust3r"], 2, dec2, img_hw, dcfg, prec)
    return _conf_sig_mean(r1["conf"]) + _conf_sig_mean(r2["conf"])


@functools.partial(jax.jit, static_argnums=(3,))
def _read_jit(params, mem, q, cfg):
    return memory_read(_memory_norms(params), mem, q,
                       attn_thresh=cfg.memory.attn_thresh)


@functools.partial(jax.jit, static_argnums=(3,))
def _write_jit(mem, k, v, cfg):
    return add_mem_check(mem, k, v, cfg.memory)


def _conf_sig_mean(conf: jax.Array) -> jax.Array:
    """mean of (conf-1)/conf over pixels (ref spann3r/model.py:346-349)."""
    sig = (conf - 1.0) / conf
    return jnp.mean(sig, axis=(-2, -1))


def pairwise_confidences(params, feats, pos, pairs, img_hw, cfg: Spann3RConfig,
                         prec: Precision = BF16, chunk: int = 8) -> np.ndarray:
    """Decode pair chunks, return summed sigmoid-conf per pair (N_pairs,)."""
    dcfg = cfg.dust3r

    def decode_chunk(f1, f2):
        return _decode_conf_jit(params, f1, f2, pos[:1], img_hw, dcfg, prec)

    confs = np.zeros(len(pairs), dtype=np.float32)
    idx = 0
    while idx < len(pairs):
        batch = pairs[idx:idx + chunk]
        if len(batch) < chunk:  # pad to the compiled chunk size
            batch = batch + [batch[-1]] * (chunk - len(batch))
        f1 = jnp.stack([feats[a] for a, _ in batch])
        f2 = jnp.stack([feats[b] for _, b in batch])
        out = np.asarray(decode_chunk(f1, f2))
        take = min(chunk, len(pairs) - idx)
        confs[idx:idx + take] = out[:take]
        idx += take
    return confs


def find_initial_pair(pairs, confs, n_frames: int) -> Tuple[int, int]:
    """argmax of the pairwise conf matrix (ref spann3r/model.py:333-357)."""
    mat = np.zeros((n_frames, n_frames), dtype=np.float32)
    for (a, b), c in zip(pairs, confs):
        mat[a, b] = c
    return tuple(int(v) for v in np.unravel_index(mat.argmax(), mat.shape))


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _pairwise_conf_scan_jit(params, feats, pos, pair_i, pair_j, dcfg,
                            img_hw, prec):
    """All pairwise confidences in ONE program: lax.scan over pair chunks.

    pair_i/pair_j: (n_chunks, chunk) frame indices (tail rows padded with
    repeats).  Returns (n_chunks, chunk) summed sigmoid-confs — the same
    numbers the per-chunk _decode_conf_jit dispatches produce (ref
    spann3r/model.py:333-357 computes this matrix one pair at a time)."""
    chunk = pair_i.shape[1]
    p_tokens = feats.shape[1]
    pp = jnp.broadcast_to(pos, (chunk, p_tokens, 2))

    def body(_, ij):
        ii, jj = ij
        f1 = jnp.take(feats, ii, axis=0)
        f2 = jnp.take(feats, jj, axis=0)
        dec1, dec2 = d3.decoder(params, f1, pp, f2, pp, dcfg, prec)
        r1 = d3.downstream_head(params, 1, dec1, img_hw, dcfg, prec)
        r2 = d3.downstream_head(params, 2, dec2, img_hw, dcfg, prec)
        return None, _conf_sig_mean(r1["conf"]) + _conf_sig_mean(r2["conf"])

    _, confs = jax.lax.scan(body, None, (pair_i, pair_j))
    return confs


def offline_reconstruction_fused(params, frames: np.ndarray,
                                 cfg: Spann3RConfig, img_hw,
                                 scene_graph: str = "complete",
                                 prec: Precision = BF16
                                 ) -> Tuple[List[Dict], List[Tuple], List[int]]:
    """Offline reconstruction with the greedy next-best-view loop fused into
    ONE on-device lax.scan program.

    The loop implementation (`offline_reconstruction`) re-enters jit per
    greedy round and fetches the candidate scores to the host to pick the
    argmax — ~2 dispatches + 1 device->host sync per round.  Here the whole
    loop (memory write -> read -> batched candidate scoring -> masked argmax
    -> pair decode) is a single compiled scan with the frame-selection mask
    carried on device, so an N-frame clip costs one encode program, the
    pairwise-conf chunks and ONE greedy program regardless of N.  Outputs
    match the loop path (same ops in the same order; only XLA fusion
    boundaries differ).  Ref control flow: spann3r/model.py:394-471.
    """
    dcfg = cfg.dust3r
    n = frames.shape[0]
    p_tokens = (img_hw[0] // dcfg.patch_size) * (img_hw[1] // dcfg.patch_size)

    feats, pos_all = d3.encode_image(params["dust3r"], jnp.asarray(frames),
                                     dcfg, prec)
    pos = pos_all[:1]

    pairs = make_pairs(n, scene_graph, symmetrize=True)
    chunk = 8
    n_chunks = -(-len(pairs) // chunk)
    padded = pairs + [pairs[-1]] * (n_chunks * chunk - len(pairs))
    pair_i = jnp.asarray([a for a, _ in padded],
                         jnp.int32).reshape(n_chunks, chunk)
    pair_j = jnp.asarray([b for _, b in padded],
                         jnp.int32).reshape(n_chunks, chunk)
    confs = np.asarray(_pairwise_conf_scan_jit(
        params["dust3r"], feats, pos, pair_i, pair_j, dcfg, img_hw,
        prec)).reshape(-1)[:len(pairs)]
    i0, i1 = find_initial_pair(pairs, confs, n)

    r1s, r2s, order = _greedy_scan_jit(params, feats, pos,
                                       jnp.int32(i0), jnp.int32(i1),
                                       n, cfg, img_hw, prec)
    r1s = {k: np.asarray(v) for k, v in r1s.items()}
    r2s = {k: np.asarray(v) for k, v in r2s.items()}
    idx_used = [i0, i1] + [int(v) for v in np.asarray(order)]

    preds, preds_all = [], []
    for t in range(n - 1):
        r1 = {"conf": r1s["conf"][t]}
        r1["pts3d" if t == 0 else "pts3d_in_other_view"] = r1s["pts3d"][t]
        r2 = {"pts3d_in_other_view": r2s["pts3d"][t], "conf": r2s["conf"][t]}
        preds.append(r1)
        preds_all.append((r1, r2))
    preds.append({"pts3d_in_other_view": r2s["pts3d"][n - 2],
                  "conf": r2s["conf"][n - 2]})
    return preds, preds_all, idx_used


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _greedy_scan_jit(params, feats, pos, i0, i1, n, cfg: Spann3RConfig,
                     img_hw, prec):
    """One-program greedy NBV: returns (res1 stacked over the n-1 pair
    steps, res2 stacked likewise, chosen-frame order (n-2,))."""
    dcfg = cfg.dust3r
    p_tokens = pos.shape[1]
    norms = _memory_norms(params)

    def pair(feat_fuse, f1, f2):
        return pair_step(params, cfg, feat_fuse, f1, f2, pos, img_hw, prec)

    def score_all(feat_fuse):
        ff = jnp.broadcast_to(feat_fuse, (n,) + feat_fuse.shape[-2:])
        pp = jnp.broadcast_to(pos, (n, p_tokens, 2))
        dec1, dec2 = d3.decoder(params["dust3r"], ff, pp, feats, pp, dcfg,
                                prec)
        r1 = d3.downstream_head(params["dust3r"], 1, dec1, img_hw, dcfg, prec)
        r2 = d3.downstream_head(params["dust3r"], 2, dec2, img_hw, dcfg, prec)
        return _conf_sig_mean(r1["conf"]) + _conf_sig_mean(r2["conf"])

    take = lambda idx: jax.lax.dynamic_index_in_dim(feats, idx, keepdims=True)

    mem0 = init_memory(1, cfg.memory.capacity(p_tokens), cfg.attn_head_out,
                       dtype=prec.compute_dtype)
    todo0 = jnp.ones((n,), bool).at[i0].set(False).at[i1].set(False)
    cur0 = pair(take(i0), take(i0), take(i1))

    def body(carry, _):
        mem, todo, i2, k1, k2, v = carry
        mem = add_mem_check(mem, k1, v + k1, cfg.memory)
        fused, mem = memory_read(norms, mem, k2,
                                 attn_thresh=cfg.memory.attn_thresh)
        scores = score_all(fused[0])
        best = jnp.argmax(jnp.where(todo, scores, -jnp.inf)).astype(jnp.int32)
        todo = todo.at[best].set(False)
        new = pair(fused, take(i2), take(best))
        y = ({"pts3d": new.res1["pts3d"], "conf": new.res1["conf"]},
             {"pts3d": new.res2["pts3d"], "conf": new.res2["conf"]},
             best)
        return (mem, todo, best, new.feat_k1, new.feat_k2, new.cur_v), y

    carry0 = (mem0, todo0, i1, cur0.feat_k1, cur0.feat_k2, cur0.cur_v)
    first1 = {"pts3d": cur0.res1["pts3d"], "conf": cur0.res1["conf"]}
    first2 = {"pts3d": cur0.res2["pts3d"], "conf": cur0.res2["conf"]}
    if n == 2:
        one = lambda d: {k: v[None] for k, v in d.items()}
        return one(first1), one(first2), jnp.zeros((0,), jnp.int32)

    _, (ys1, ys2, order) = jax.lax.scan(body, carry0, None, length=n - 2)
    r1s = {k: jnp.concatenate([first1[k][None], ys1[k]]) for k in first1}
    r2s = {k: jnp.concatenate([first2[k][None], ys2[k]]) for k in first2}
    return r1s, r2s, order


def offline_reconstruction(params, frames: np.ndarray, cfg: Spann3RConfig,
                           img_hw, scene_graph: str = "complete",
                           prec: Precision = BF16
                           ) -> Tuple[List[Dict], List[Tuple], List[int]]:
    """frames: (N, H, W, 3) normalized -> (preds, preds_all, idx_used).

    Follows the reference control flow (spann3r/model.py:394-471) with
    batched candidate scoring.  See offline_reconstruction_fused for the
    single-program variant used by the TPU serving path.
    """
    dcfg = cfg.dust3r
    n = frames.shape[0]
    p_tokens = (img_hw[0] // dcfg.patch_size) * (img_hw[1] // dcfg.patch_size)

    # 1. batched encode of every frame, once
    feats, pos_all = d3.encode_image(params["dust3r"], jnp.asarray(frames),
                                     dcfg, prec)
    pos = pos_all[:1]
    feats_list = [feats[i:i + 1] for i in range(n)]

    # 2. pairwise confidence matrix -> initial pair
    pairs = make_pairs(n, scene_graph, symmetrize=True)
    confs = pairwise_confidences(params["dust3r"],
                                 {i: feats[i] for i in range(n)},
                                 pos_all, pairs, img_hw, cfg, prec)
    i0, i1 = find_initial_pair(pairs, confs, n)

    # jitted single-pair step (shared with the online engine)
    def _pair(feat_fuse, f1, f2):
        return _pair_jit(params, feat_fuse, f1, f2, pos, cfg, img_hw, prec)

    # batched candidate scorer: decode every frame against the fused ref
    def _score_all(feat_fuse, all_feats):
        return _score_all_jit(params, feat_fuse, all_feats, pos, n, cfg,
                              img_hw, prec)

    mem = init_memory(1, cfg.memory.capacity(p_tokens), cfg.attn_head_out,
                      dtype=prec.compute_dtype)
    read = lambda m, q: _read_jit(params, m, q, cfg)
    write = lambda m, k, v: _write_jit(m, k, v, cfg)

    idx_used = [i0, i1]
    idx_todo = [i for i in range(n) if i not in idx_used]

    out = _pair(feats_list[i0], feats_list[i0], feats_list[i1])
    preds, preds_all = [], []

    def push(out, first: bool):
        r1 = {"conf": out.res1["conf"]}
        r1["pts3d" if first else "pts3d_in_other_view"] = out.res1["pts3d"]
        r2 = {"pts3d_in_other_view": out.res2["pts3d"], "conf": out.res2["conf"]}
        preds.append(r1)
        preds_all.append((r1, r2))
        return r2

    cur = out
    first = True
    cur_feat2_idx = i1
    while True:
        mem = write(mem, cur.feat_k1, cur.cur_v + cur.feat_k1)
        last_r2 = push(cur, first)
        first = False
        if not idx_todo:
            break
        fused, mem = read(mem, cur.feat_k2)
        scores = np.asarray(_score_all(fused[0], feats))
        mask = np.full(n, -np.inf, dtype=np.float32)
        mask[idx_todo] = 0.0
        best = int(np.argmax(scores + mask))
        idx_todo.remove(best)
        idx_used.append(best)
        cur = _pair(fused, feats_list[cur_feat2_idx], feats_list[best])
        cur_feat2_idx = best

    preds.append(last_r2)
    return preds, preds_all, idx_used

"""Spatial memory: fixed-capacity token bank with masked ops.

TPU re-design of the reference SpatialMemory (spann3r/model.py:11-210),
which grows tensors with torch.cat and prunes with data-dependent shapes.
Here the bank has a STATIC capacity with per-stream validity counts, so
every op is a masked dense op and the whole frame loop compiles under
jit/lax.scan:

  - append       = per-stream dynamic-update-slice at each stream's size
  - dedup check  = masked cosine similarity vs the working-memory window
  - spill        = counter bookkeeping only (working -> long-term)
  - prune        = lax.top_k over masked usage weights + gather
  - read         = single-head attention with -inf masking + threshold renorm

All counters (size/wm/lm) are per-stream (B,) so a batch of B independent
video streams can be served through one program with per-stream dedup and
pruning — the reference makes one global decision because it only ever runs
B=1 at eval (spann3r/model.py:114 takes the batch max); for B=1 the
semantics coincide and parity is tested step by step
(tests/test_memory.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MemoryConfig
from ..ops.layers import layer_norm

NEG_INF = -1e30


class MemoryState(NamedTuple):
    """Token bank. Per stream b, slots [0, size[b]) are valid; order matches
    the reference's append/prune ordering: the working memory is the bank
    suffix UNTIL the first prune, after which top_k places protected slots
    first (the reference's topk gather has the identical reordering quirk,
    spann3r/model.py:193-200 — check_sim behaves the same in both)."""
    k: jax.Array        # (B, C, D) keys
    v: jax.Array        # (B, C, D) values
    count: jax.Array    # (B, C) age of each slot in frames
    attn: jax.Array     # (B, C) accumulated attention received
    size: jax.Array     # (B,) int32 — number of valid token slots
    wm: jax.Array       # (B,) int32 — number of working-memory frames
    lm: jax.Array       # (B,) int32 — number of long-term tokens


def init_memory(batch: int, capacity: int, dim: int,
                dtype=jnp.bfloat16) -> MemoryState:
    return MemoryState(
        k=jnp.zeros((batch, capacity, dim), dtype),
        v=jnp.zeros((batch, capacity, dim), dtype),
        count=jnp.zeros((batch, capacity), jnp.float32),
        attn=jnp.zeros((batch, capacity), jnp.float32),
        size=jnp.zeros((batch,), jnp.int32),
        wm=jnp.zeros((batch,), jnp.int32),
        lm=jnp.zeros((batch,), jnp.int32),
    )


def _valid_mask(state: MemoryState) -> jax.Array:
    c = state.k.shape[1]
    return jnp.arange(c, dtype=jnp.int32)[None, :] < state.size[:, None]


def _per_stream_select(pred: jax.Array, new: MemoryState,
                       old: MemoryState) -> MemoryState:
    """Select new/old per stream; pred: (B,) bool."""
    def sel(a, b):
        p = pred.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(p, a, b)

    return jax.tree.map(sel, new, old)


def _use_pallas_memread() -> bool:
    """Fused Pallas bank-readout dispatch (ops/pallas_memory.py).

    Default ON for TPU backends: the kernel is inference-only (B=1,
    attn_thresh>0, no dropout — exactly the serving read), parity-tested
    in tests/test_pallas_memory.py, and ~15x faster than the XLA
    masked-softmax read at 512-res bank sizes (PERF.md), so demo/eval/app
    share bench.py's configuration. Env override: SPANN3R_PALLAS_MEMREAD=0
    forces the XLA path, =1 forces the kernel (CPU interpret-mode tests).
    Read at TRACE time — set it before the first jit of a serving program
    (flips after tracing are no-ops on cached programs).
    """
    import os
    flag = os.environ.get("SPANN3R_PALLAS_MEMREAD")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def memory_read(norms, state: MemoryState, feat: jax.Array,
                attn_thresh: float, ln_eps: float = 1e-6,
                dropout_rng: Optional[jax.Array] = None,
                dropout_rate: float = 0.0,
                res: bool = True) -> Tuple[jax.Array, MemoryState]:
    """Attention readout of the bank (ref spann3r/model.py:145-183).

    feat: (B, P, D) query features.  Returns (fused (B, P, D), state with
    accumulated attention).  Streams with empty banks get feat unchanged.

    With SPANN3R_PALLAS_MEMREAD=1 (inference, B=1, no dropout) the
    masked-softmax + threshold-renorm + attn-stat chain runs as one fused
    Pallas kernel streaming the bank from HBM (ops/pallas_memory.py).
    """
    d = feat.shape[-1]
    q = layer_norm(norms["norm_q"], feat, ln_eps)
    k = layer_norm(norms["norm_k"], state.k.astype(feat.dtype), ln_eps)
    vv = layer_norm(norms["norm_v"], state.v.astype(feat.dtype), ln_eps)
    has_mem = (state.size > 0)

    # the Pallas kernel has no VJP; attn_thresh > 0 statically excludes the
    # (differentiable) training path, which always uses attn_thresh=0
    if (_use_pallas_memread() and feat.shape[0] == 1
            and dropout_rng is None and attn_thresh > 0):
        from ..ops.pallas_memory import memory_read_attention
        out, attn_slot = memory_read_attention(q, k, vv, state.size[0],
                                               attn_thresh)
        if res:
            out = out + feat
        out = jnp.where(has_mem[:, None, None], out, feat)
        new_attn = state.attn + jnp.where(has_mem[:, None], attn_slot, 0.0)
        return out, state._replace(attn=new_attn)

    logits = jnp.einsum("bpc,bxc->bpx", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    logits = jnp.where(_valid_mask(state)[:, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)

    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)

    if attn_thresh > 0:
        attn = jnp.where(attn < attn_thresh, 0.0, attn)
        attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + 1e-12)

    out = jnp.einsum("bpx,bxc->bpc", attn.astype(vv.dtype), vv,
                     preferred_element_type=jnp.float32).astype(feat.dtype)
    if res:
        out = out + feat

    out = jnp.where(has_mem[:, None, None], out, feat)
    new_attn = state.attn + jnp.where(has_mem[:, None],
                                      jnp.sum(attn, axis=-2), 0.0)
    return out, state._replace(attn=new_attn)


def _append(state: MemoryState, feat_k: jax.Array, feat_v: jax.Array) -> MemoryState:
    """Unconditional append of one frame's P tokens (ref model.py:80-95).
    Valid slots age by one frame; new slots start at age 0 / attn 0."""
    p = feat_k.shape[1]
    valid = _valid_mask(state).astype(jnp.float32)
    count = state.count + valid
    zeros_p = jnp.zeros((state.k.shape[0], p), jnp.float32)

    def upd3(buf, new, start):
        return jax.lax.dynamic_update_slice(buf, new, (start, jnp.int32(0)))

    def upd2(buf, new, start):
        return jax.lax.dynamic_update_slice(buf, new, (start,))

    return state._replace(
        k=jax.vmap(upd3)(state.k, feat_k.astype(state.k.dtype), state.size),
        v=jax.vmap(upd3)(state.v, feat_v.astype(state.v.dtype), state.size),
        count=jax.vmap(upd2)(count, zeros_p, state.size),
        attn=jax.vmap(upd2)(state.attn, zeros_p, state.size),
        size=state.size + p,
    )


def add_mem(state: MemoryState, feat_k: jax.Array, feat_v: jax.Array) -> MemoryState:
    """Training-mode write: append only (ref model.py:518-519)."""
    return _append(state, feat_k, feat_v)


def check_sim(state: MemoryState, feat_k: jax.Array, num_patches: int,
              work_mem_size: int, sim_thresh: float) -> jax.Array:
    """Mean-cosine dedup vs the working-memory window
    (ref model.py:97-118) -> per-stream bool (B,)."""
    b, p, d = feat_k.shape
    w_frames = work_mem_size
    w_tokens = w_frames * num_patches
    # gather each stream's last wm*P valid tokens into (B, Wf, P, D)
    start = state.size - state.wm * num_patches              # (B,)
    idx = start[:, None] + jnp.arange(w_tokens, dtype=jnp.int32)[None]
    idx = jnp.clip(idx, 0, state.k.shape[1] - 1)             # (B, W)
    window = jnp.take_along_axis(state.k, idx[:, :, None],
                                 axis=1).astype(jnp.float32)
    window = window.reshape(b, w_frames, num_patches, d)

    fk = feat_k.astype(jnp.float32)
    fk = fk / jnp.clip(jnp.linalg.norm(fk, axis=-1, keepdims=True), 1e-12)
    wn = window / jnp.clip(jnp.linalg.norm(window, axis=-1, keepdims=True), 1e-12)
    corr = jnp.einsum("bpc,btpc->btp", fk, wn)
    mean_corr = jnp.mean(corr, axis=-1)  # (B, Wf)
    # window rows [0, wm) hold the valid working frames (slice starts at
    # size - wm*P); rows beyond wm are clipped junk -> masked out
    frame_valid = jnp.arange(w_frames, dtype=jnp.int32)[None] < state.wm[:, None]
    mean_corr = jnp.where(frame_valid, mean_corr, NEG_INF)
    return (state.size > 0) & (jnp.max(mean_corr, axis=1) > sim_thresh)


def memory_prune(state: MemoryState, cfg: MemoryConfig) -> MemoryState:
    """Keep top long_mem_size slots by accumulated-attention/age weight,
    protecting young slots (ref model.py:185-210).  Applies to every stream;
    callers merge per stream."""
    weights = state.attn / jnp.clip(state.count, 1e-8)
    weights = jnp.where(state.count < cfg.protect_age, 1e8, weights)
    weights = jnp.where(_valid_mask(state), weights, NEG_INF)
    _, idx = jax.lax.top_k(weights, cfg.long_mem_size)  # (B, K) stable ties
    gather = lambda arr: jnp.take_along_axis(
        arr, idx[..., None] if arr.ndim == 3 else idx, axis=1)
    c = state.k.shape[1]
    pad = c - cfg.long_mem_size

    def padded(arr):
        g = gather(arr)
        shape = list(g.shape)
        shape[1] = pad
        return jnp.concatenate([g, jnp.zeros(shape, g.dtype)], axis=1)

    return state._replace(
        k=padded(state.k), v=padded(state.v),
        count=padded(state.count), attn=padded(state.attn),
        size=jnp.full_like(state.size, cfg.long_mem_size),
    )


def add_mem_check(state: MemoryState, feat_k: jax.Array, feat_v: jax.Array,
                  cfg: MemoryConfig,
                  skip: Optional[jax.Array] = None) -> MemoryState:
    """Eval-mode write: dedup -> append -> spill -> prune, each decided
    per stream (ref spann3r/model.py:120-143).

    `skip` (per-stream or scalar bool) makes the write a no-op for those
    streams — folded into the dedup select so callers under lax.scan don't
    pay an extra full-bank where-copy for frame gating."""
    p = feat_k.shape[1]
    if cfg.sim_thresh >= 1.0:  # dedup disabled (ref model.py:99 early-return)
        dup = jnp.zeros((feat_k.shape[0],), bool)
    else:
        dup = check_sim(state, feat_k, p, cfg.work_mem_size, cfg.sim_thresh)
    if skip is not None:
        dup = dup | skip

    s = _append(state, feat_k, feat_v)
    s = s._replace(wm=s.wm + 1)
    spill = s.wm > cfg.work_mem_size

    if cfg.long_mem_size == 0:
        # pure sliding window (ref spann3r/model.py:131-137): evict the
        # oldest frame by rolling the bank left by one frame's tokens
        def roll(a):
            return jnp.roll(a, -p, axis=1) if a.ndim >= 2 else a

        evicted = MemoryState(roll(s.k), roll(s.v), roll(s.count),
                              roll(s.attn), s.size - p, s.wm - 1, s.lm)
        s = _per_stream_select(spill, evicted, s)
    else:
        # working -> long-term spill (counter-only; the bank is contiguous)
        s = s._replace(
            wm=jnp.where(spill, s.wm - 1, s.wm),
            lm=jnp.where(spill, s.lm + p, s.lm),
        )
        # prune streams whose long-term exceeds the budget; statically
        # unreachable when the bank can never grow past long_mem_size
        if cfg.long_mem_size < s.k.shape[1]:
            need = s.lm > cfg.long_mem_size

            def prune(s2: MemoryState) -> MemoryState:
                s3 = memory_prune(s2, cfg)
                s3 = s3._replace(lm=jnp.full_like(s3.lm, cfg.long_mem_size)
                                 - s3.wm * p)
                return _per_stream_select(need, s3, s2)

            s = jax.lax.cond(jnp.any(need), prune, lambda x: x, s)

    return _per_stream_select(dup, state, s)
"""Spann3R: DUSt3R wrapped in a spatial memory (TPU rebuild of spann3r/model.py).

Architecture (parity with the reference, independent implementation):
  - frozen-shape DUSt3R backbone (models/dust3r.py)
  - 6-block value encoder @1024 + LayerNorm + Linear (ref model.py:228-248)
  - pointmap patch embed (a second patch embed tokenizing predicted pts3d)
  - two attn-head MLPs (1792 -> 1792 -> 1024) building memory queries/keys
    from encoder feat (1024) ++ last decoder state (768) (ref model.py:250-261)
  - q/k/v LayerNorms + memory dropout

TPU-first deviations from the reference's *implementation* (same semantics):
  - All frames are encoded in ONE batched ViT-L pass (the reference encodes
    each frame lazily inside the python loop); the sequential part is only
    the decode+memory scan.
  - The frame loop is lax.scan with a fixed-capacity memory, so the whole
    T-frame training step is a single XLA program.
  - Inference runs as a host loop over a handful of jitted step functions
    with static shapes (compiled once, streamed over arbitrarily long video).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BF16, Precision, Spann3RConfig, ViTConfig
from ..ops.layers import gelu, init_layer_norm, init_linear, layer_norm, linear
from . import dust3r as d3
from .memory import add_mem, add_mem_check, init_memory, memory_read
from .vit import (encoder_apply, init_block_stack, init_patch_embed,
                  patch_embed_apply)


def value_encoder_cfg(cfg: Spann3RConfig) -> ViTConfig:
    # rope disabled: reference builds value blocks with rope=None unless
    # mem_pos_enc (spann3r/model.py:232-235)
    return ViTConfig(dim=cfg.value_enc_dim, depth=cfg.value_enc_depth,
                     num_heads=cfg.value_enc_heads,
                     rope_base=100.0 if cfg.mem_pos_enc else 0.0)


def init_spann3r(key, cfg: Spann3RConfig, dtype=jnp.float32):
    """Random-init the full param pytree (ref spann3r/model.py:222-261 module
    tree; initializer choices documented on the leaf init fns).

    On an accelerator backend the whole init runs as ONE jitted program:
    eagerly, the ~hundreds of small RNG dispatches each pay a tunnel
    round-trip + remote mini-compile on the axon setup (measured 193 s for
    the full model); one fused program is 79 s to compile once, then ~15 s
    in every later process via the persistent compile cache. On CPU (the
    test path, many tiny throwaway configs) eager is faster than
    compiling, so the wrapper is skipped.
    """
    if jax.default_backend() != "cpu":
        return _init_spann3r_jitted(key, cfg, dtype)
    return _init_spann3r(key, cfg, dtype)


def _init_spann3r(key, cfg: Spann3RConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    p = {
        "dust3r": d3.init_dust3r(keys[0], cfg.dust3r, dtype),
        "value_encoder": init_block_stack(keys[1], value_encoder_cfg(cfg), dtype),
        "value_norm": init_layer_norm(cfg.value_enc_dim, dtype),
        "value_out": init_linear(keys[2], cfg.value_enc_dim, cfg.attn_head_out, dtype=dtype),
        "norm_q": init_layer_norm(cfg.attn_head_out, dtype),
        "norm_k": init_layer_norm(cfg.attn_head_out, dtype),
        "norm_v": init_layer_norm(cfg.attn_head_out, dtype),
        "attn_head_1": _init_attn_head(keys[3], cfg, dtype),
        "attn_head_2": _init_attn_head(keys[4], cfg, dtype),
    }
    if not cfg.use_feat:
        p["pos_patch_embed"] = init_patch_embed(keys[5], cfg.dust3r.patch_size,
                                                3, cfg.dust3r.enc.dim, dtype)
    return p


_init_spann3r_jitted = jax.jit(_init_spann3r, static_argnums=(1, 2))


def _init_attn_head(key, cfg: Spann3RConfig, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, cfg.attn_head_in, cfg.attn_head_in, dtype=dtype),
            "fc2": init_linear(k2, cfg.attn_head_in, cfg.attn_head_out, dtype=dtype)}


def attn_head_apply(p, feat_enc: jax.Array, feat_dec: jax.Array) -> jax.Array:
    """Memory query/key features (ref spann3r/model.py:299-303)."""
    x = jnp.concatenate([feat_enc, feat_dec.astype(feat_enc.dtype)], axis=-1)
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def encode_value(params, cfg: Spann3RConfig, res1_pts: jax.Array,
                 dec_last: jax.Array, pos: jax.Array,
                 prec: Precision = BF16, remat: bool = False) -> jax.Array:
    """Value tokens from the predicted reference pointmap
    (ref spann3r/model.py:305-320)."""
    vcfg = value_encoder_cfg(cfg)
    if cfg.use_feat:
        x = dec_last.astype(prec.compute_dtype)
        pos_v = pos
    else:
        x, pos_v = patch_embed_apply(params["pos_patch_embed"],
                                     res1_pts.astype(prec.compute_dtype),
                                     cfg.dust3r.patch_size)
    x = encoder_apply(params["value_encoder"], x, pos_v, vcfg, remat=remat)
    x = layer_norm(params["value_norm"], x, vcfg.ln_eps)
    return linear(params["value_out"], x)


def _memory_norms(params):
    return {"norm_q": params["norm_q"], "norm_k": params["norm_k"],
            "norm_v": params["norm_v"]}


class PairOutputs(NamedTuple):
    res1: Dict[str, jax.Array]
    res2: Optional[Dict[str, jax.Array]]
    feat_k1: jax.Array
    feat_k2: jax.Array
    cur_v: jax.Array
    # dec2 hook states (feat2, *block outputs at head_hooks) when the res2
    # head is deferred (compute_res2=False); None otherwise
    dec2_hooks: Optional[Tuple[jax.Array, ...]] = None


def pair_step(params, cfg: Spann3RConfig, feat_fuse: jax.Array,
              feat1: jax.Array, feat2: jax.Array, pos: jax.Array,
              img_hw: Tuple[int, int], prec: Precision = BF16,
              remat: bool = False, compute_res2: bool = True) -> PairOutputs:
    """Decode one (reference, target) frame pair and build memory features.

    feat_fuse: memory-fused reference features (== feat1 on the first pair).
    Ref: the body of the loop at spann3r/model.py:502-516.

    compute_res2=False skips the target-frame head and returns its decoder
    hook states instead — the streaming video scan discards every res2 but
    the last (ref spann3r/model.py:523-534 keeps only the final pair's
    target prediction), so the head runs once per video via
    `head2_from_hooks` rather than once per frame.
    """
    dcfg = cfg.dust3r
    dec1, dec2 = d3.decoder(params["dust3r"], feat_fuse, pos, feat2, pos,
                            dcfg, prec, remat=remat)
    feat_k1 = attn_head_apply(params["attn_head_1"], feat1, dec1[-1])
    feat_k2 = attn_head_apply(params["attn_head_2"], feat2, dec2[-1])
    res1 = d3.downstream_head(params["dust3r"], 1, dec1, img_hw, dcfg, prec)
    if compute_res2:
        res2, hooks2 = d3.downstream_head(params["dust3r"], 2, dec2, img_hw,
                                          dcfg, prec), None
    else:
        res2 = None
        hooks2 = tuple([dec2[0]] + [dec2[h] for h in d3.head_hooks(dcfg)])
    cur_v = encode_value(params, cfg, res1["pts3d"], dec1[-1], pos, prec, remat)
    return PairOutputs(res1, res2, feat_k1, feat_k2, cur_v, hooks2)


def head2_from_hooks(params, cfg: Spann3RConfig,
                     hook_states: Tuple[jax.Array, ...],
                     img_hw: Tuple[int, int],
                     prec: Precision = BF16) -> Dict[str, jax.Array]:
    """Run the deferred target-frame head on carried decoder hook states."""
    dcfg = cfg.dust3r
    states = d3.states_from_hooks(dcfg, hook_states)
    return d3.downstream_head(params["dust3r"], 2, states, img_hw, dcfg, prec)


# ---------------------------------------------------------------------------
# training forward: lax.scan over the frame sequence
# ---------------------------------------------------------------------------

def forward_train(params, frames: jax.Array, cfg: Spann3RConfig,
                  prec: Precision = BF16, rng: Optional[jax.Array] = None,
                  remat: bool = True,
                  remat_scan: Optional[bool] = None) -> Dict[str, jax.Array]:
    """frames: (B, T, H, W, 3) -> per-pair predictions stacked over time.

    Training memory semantics = unconditional append, attn_thresh=0, dropout
    active when rng is given (ref spann3r/model.py:473-519, training branch).

    remat_scan (default: env SPANN3R_REMAT_SCAN=1): additionally checkpoint
    the WHOLE pair-step scan body — the backward recomputes the entire
    decode+heads+memory step per pair instead of saving its intermediates
    across T-1 iterations.  Costs ~one extra forward but shrinks per-
    iteration activation memory to the carry, buying longer clips/bigger
    batches on a 16 GB chip (B=4 x T=10 @224 only compiles this way).

    Returns dict of stacked arrays with leading time axis T-1:
      pts3d_1, conf_1  — reference-frame predictions (frame t  in frame-0 coords)
      pts3d_2, conf_2  — target-frame predictions   (frame t+1 in frame-0 coords)
    """
    import os
    if remat_scan is None:
        remat_scan = bool(os.environ.get("SPANN3R_REMAT_SCAN"))
    b, t, h, w, _ = frames.shape
    dcfg = cfg.dust3r
    p_tokens = (h // dcfg.patch_size) * (w // dcfg.patch_size)

    # one batched encoder pass over all frames.  SPANN3R_NO_REMAT_ENC=1
    # keeps the encoder's activations resident instead of rematerializing
    # them in the backward — the encoder is OUTSIDE the sequential pair
    # scan (one big batched pass), so its saved activations are paid once,
    # and skipping its recompute saves ~a full ViT-L forward per step.
    # Opt-in: costs ~depth x B*T x P x dim x a-few tensors of bf16 HBM;
    # measured ablation in tools/train_ablate.py ("encsave" variant).
    remat_enc = remat and not os.environ.get("SPANN3R_NO_REMAT_ENC")
    flat = frames.reshape(b * t, h, w, 3)
    feats, pos = d3.encode_image(params["dust3r"], flat, dcfg, prec,
                                 remat=remat_enc)
    feats = feats.reshape(b, t, p_tokens, -1).transpose(1, 0, 2, 3)  # (T,B,P,D)
    pos = pos[:b]

    mem0 = init_memory(b, (t - 1) * p_tokens, cfg.attn_head_out,
                       dtype=prec.compute_dtype)
    feat_k2_0 = jnp.zeros((b, p_tokens, cfg.attn_head_out), prec.compute_dtype)

    def body(carry, step):
        mem, feat_k2_prev = carry
        i, feat1, feat2 = step
        if rng is not None:
            step_rng = jax.random.fold_in(rng, i)
        else:
            step_rng = None
        fused, mem = memory_read(_memory_norms(params), mem, feat_k2_prev,
                                 attn_thresh=0.0,
                                 dropout_rng=step_rng,
                                 dropout_rate=cfg.memory.mem_dropout if rng is not None else 0.0)
        feat_fuse = jnp.where(i == 0, feat1, fused)
        out = pair_step(params, cfg, feat_fuse, feat1, feat2, pos, (h, w),
                        prec, remat=remat)
        mem = add_mem(mem, out.feat_k1, out.cur_v + out.feat_k1)
        ys = {"pts3d_1": out.res1["pts3d"], "conf_1": out.res1["conf"],
              "pts3d_2": out.res2["pts3d"], "conf_2": out.res2["conf"]}
        return (mem, out.feat_k2), ys

    if remat_scan:
        body = jax.checkpoint(body, prevent_cse=False)
    steps = (jnp.arange(t - 1, dtype=jnp.int32), feats[:-1], feats[1:])
    # SPANN3R_UNROLL_TSCAN=<n>: unroll the T-scan body n-fold (numerics-
    # neutral; lax.scan unroll). With n = T-1 the loop disappears and XLA
    # can fuse the per-iteration shared-weight grad adds into their
    # consumers — the last named train-step residue (PERF.md r5,
    # add_add_fusion ~13 ms/step; measured 309.2 -> 289.1 ms/step
    # wall-synced at B=4 T=5 @224). DEFAULT: full unroll for short
    # sequences (T-1 <= 4, the reference's 5-frame recipe) — the one-time
    # compile cost (26 s -> 123 s through the remote-compile tunnel, then
    # disk-cached) buys ~7% per step. Longer scans keep the rolled loop:
    # an n-fold body grows compile time/memory n-fold (the encsave remote
    # -compile crash is the cautionary precedent). Env overrides either way.
    env = os.environ.get("SPANN3R_UNROLL_TSCAN")
    unroll = int(env) if env else (t - 1 if t - 1 <= 4 else 1)
    (_, _), ys = jax.lax.scan(body, (mem0, feat_k2_0), steps,
                              unroll=max(1, unroll))
    return ys


# ---------------------------------------------------------------------------
# chunked on-device video scan (eval memory semantics)
# ---------------------------------------------------------------------------

def scan_video_chunk(params, cfg: Spann3RConfig, carry, imgs: jax.Array,
                     frame_valid: jax.Array, img_hw: Tuple[int, int],
                     prec: Precision = BF16):
    """Process `chunk` frames in ONE device program via lax.scan.

    carry: (mem, feat_prev, feat_k2, dec2_prev, have_prev, have_key) where
    dec2_prev holds the last written frame's target-decoder hook states —
    the res2 head itself runs ONCE per video on those states
    (`head2_from_hooks`) instead of once per frame, since every res2 but
    the last is discarded (ref preds contract, spann3r/model.py:523-534).
    imgs: (chunk, B, H, W, 3) uint8 or normalized float
    frame_valid: (chunk,) bool — False for padding frames (no-ops)

    Emits per-frame res1 (the reference-frame prediction of pair
    (t-1, t)) in bf16.
    """
    dcfg = cfg.dust3r
    odt = jnp.bfloat16 if prec.compute_dtype == jnp.bfloat16 else jnp.float32

    def prep(img):
        if img.dtype == jnp.uint8:
            return img.astype(prec.compute_dtype) * (2.0 / 255.0) - 1.0
        return img.astype(prec.compute_dtype)

    # Encode ALL chunk frames in ONE batched ViT-L pass (far better MXU
    # utilization than per-frame B=1 encodes inside the scan); only the
    # decode+memory chain — the true data dependency — stays sequential.
    chunk, b, h, w, _ = imgs.shape
    flat = prep(imgs.reshape(chunk * b, h, w, 3))
    feats_all, pos = d3.encode_image(params["dust3r"], flat, dcfg, prec)
    feats_all = feats_all.reshape(chunk, b, feats_all.shape[-2],
                                  feats_all.shape[-1])
    pos = pos[:b]

    def body(carry, step):
        mem, feat_prev, feat_k2, dec2_prev, have_prev, have_key = carry
        feat2, valid = step
        fused, mem_read = memory_read(_memory_norms(params), mem, feat_k2,
                                      attn_thresh=cfg.memory.attn_thresh)
        feat_fuse = jnp.where(have_key, fused, feat_prev)
        # memory_read only touches the attn statistic — gate just that field
        # rather than where-copying the whole 30+MB bank
        mem = mem._replace(attn=jnp.where(valid & have_key,
                                          mem_read.attn, mem.attn))
        out = pair_step(params, cfg, feat_fuse, feat_prev, feat2, pos,
                        img_hw, prec, compute_res2=False)
        do_write = valid & have_prev
        mem = add_mem_check(mem, out.feat_k1, out.cur_v + out.feat_k1,
                            cfg.memory, skip=~do_write)

        dec2_prev = jax.tree.map(lambda a, b: jnp.where(do_write, a, b),
                                 out.dec2_hooks, dec2_prev)
        new_carry = (
            mem,
            jnp.where(valid, feat2, feat_prev),
            jnp.where(valid & have_prev, out.feat_k2, feat_k2),
            dec2_prev,
            have_prev | valid,
            have_key | (valid & have_prev),
        )
        ys = {"pts3d": out.res1["pts3d"].astype(odt),
              "conf": out.res1["conf"].astype(odt),
              "emitted": do_write}
        return new_carry, ys

    return jax.lax.scan(body, carry, (feats_all, frame_valid))


def init_video_carry(cfg: Spann3RConfig, img_hw: Tuple[int, int],
                     batch: int = 1, prec: Precision = BF16):
    dcfg = cfg.dust3r
    p_tokens = (img_hw[0] // dcfg.patch_size) * (img_hw[1] // dcfg.patch_size)
    capacity = cfg.memory.capacity(p_tokens)
    mem = init_memory(batch, capacity, cfg.attn_head_out,
                      dtype=prec.compute_dtype)
    feat0 = jnp.zeros((batch, p_tokens, dcfg.enc.dim), prec.compute_dtype)
    key0 = jnp.zeros((batch, p_tokens, cfg.attn_head_out), prec.compute_dtype)
    dec2_0 = tuple(
        [jnp.zeros((batch, p_tokens, dcfg.enc.dim), prec.compute_dtype)]
        + [jnp.zeros((batch, p_tokens, dcfg.dec.dim), prec.compute_dtype)
           for _ in d3.head_hooks(dcfg)])
    return (mem, feat0, key0, dec2_0,
            jnp.zeros((), bool), jnp.zeros((), bool))


# ---------------------------------------------------------------------------
# streaming inference engine
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _engine_programs(cfg: Spann3RConfig, img_hw: Tuple[int, int],
                     prec: Precision) -> Dict[str, object]:
    """Jitted serving programs, memoized on the (frozen) config tuple.

    Every InferenceEngine with the same (cfg, resolution, precision)
    shares ONE set of jitted callables, so multi-scene drivers (eval.py
    loops one engine per scene, api.reconstruct_video one per call) pay
    Python tracing once per process instead of once per scene — several
    seconds/scene of host time on a 1-core box, on top of the disk-cached
    XLA compile.  The reference has no analogue (eager torch has no trace
    step); this is jit-caching hygiene, not a behaviour change.
    """
    dcfg = cfg.dust3r

    def _prep(img):
        if img.dtype == jnp.uint8:
            img = img.astype(prec.compute_dtype) * (2.0 / 255.0) - 1.0
        return img

    def fused(p, mem, feat1, feat_k2, img2, first, compute_res2):
        feat2, pos = d3.encode_image(p["dust3r"], _prep(img2), dcfg, prec)
        if first:
            feat_fuse = feat1
        else:
            feat_fuse, mem = memory_read(_memory_norms(p), mem, feat_k2,
                                         attn_thresh=cfg.memory.attn_thresh)
        out = pair_step(p, cfg, feat_fuse, feat1, feat2, pos, img_hw, prec,
                        compute_res2=compute_res2)
        mem = add_mem_check(mem, out.feat_k1, out.cur_v + out.feat_k1,
                            cfg.memory)
        return mem, feat2, out

    return {
        "encode": jax.jit(
            lambda p, img: d3.encode_image(p["dust3r"], _prep(img), dcfg,
                                           prec)),
        "fused": jax.jit(fused, static_argnames=("first", "compute_res2"),
                         donate_argnums=(1,)),
        "head2": jax.jit(lambda p, hs: head2_from_hooks(
            p, cfg, hs, img_hw, prec)),
        "read": jax.jit(
            lambda p, mem, q: memory_read(_memory_norms(p), mem, q,
                                          attn_thresh=cfg.memory.attn_thresh)),
        "pair": jax.jit(
            lambda p, fuse, f1, f2, pos: pair_step(p, cfg, fuse, f1, f2, pos,
                                                   img_hw, prec)),
        "write": jax.jit(lambda mem, k, v: add_mem_check(mem, k, v,
                                                         cfg.memory)),
        # one jitted callable handles every chunk length (shapes key the
        # jit cache internally); no per-chunk re-wrap needed
        "scan_chunk": jax.jit(
            lambda p, carry, imgs, valid: scan_video_chunk(
                p, cfg, carry, imgs, valid, img_hw, prec),
            donate_argnums=(1,)),
    }


class InferenceEngine:
    """Incremental reconstruction over an arbitrarily long frame stream.

    Host-side loop around ONE fused jitted step (compiled once per
    resolution): encode -> memory read -> dual decode -> heads -> value
    encode -> memory write, with the 30+MB memory bank donated in place.
    Memory uses the eval semantics: cosine dedup, working -> long-term
    spill, usage-based pruning (ref spann3r/model.py:520-521).

    Frames can be fed as normalized float (dataset pipeline) or raw uint8
    (`raw=True`) with on-device normalization — 4x less host->device
    traffic, which matters when the chip sits behind a network tunnel.
    """

    def __init__(self, params, cfg: Spann3RConfig, img_hw: Tuple[int, int],
                 prec: Precision = BF16, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.prec = prec
        self.img_hw = tuple(img_hw)
        self.batch = batch
        dcfg = cfg.dust3r
        self.p_tokens = (img_hw[0] // dcfg.patch_size) * (img_hw[1] // dcfg.patch_size)
        self.capacity = cfg.memory.capacity(self.p_tokens)

        progs = _engine_programs(cfg, self.img_hw, prec)
        self._encode = progs["encode"]
        self._fused = progs["fused"]
        self._head2_jit = progs["head2"]
        # kept for offline mode / tests that drive the pieces directly
        self._read = progs["read"]
        self._pair = progs["pair"]
        self._write = progs["write"]
        self._scan_chunk = progs["scan_chunk"]
        self.reset()

    def reset(self):
        self.mem = init_memory(self.batch, self.capacity, self.cfg.attn_head_out,
                               dtype=self.prec.compute_dtype)
        self._feat_prev = None
        self._feat_k2 = None
        self._last_hooks = None

    def encode(self, img: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """img: (B, H, W, 3) normalized (or uint8)."""
        return self._encode(self.params, img)

    def put_frame(self, frame) -> jax.Array:
        """Start an async host->device transfer of one frame."""
        return jax.device_put(frame)

    def step(self, img: jax.Array,
             want_res2: bool = False) -> Optional[Dict[str, jax.Array]]:
        """Feed the next frame; returns the prediction pair for
        (previous, current) frames, or None on the very first frame.

        The target-frame (res2) DPT head is DEFERRED by default — every
        res2 but the last is discarded in the reference preds contract
        (spann3r/model.py:523-534), and the head costs ~1.8 ms/frame — so
        the step carries the decoder hook states instead and "res2" is
        None.  Call `target_prediction()` (or pass want_res2=True) to run
        the head on the latest states when a mid-stream target prediction
        is actually needed.
        """
        if self._feat_prev is None:
            self._feat_prev, _ = self.encode(img)
            return None
        first = self._feat_k2 is None
        feat_k2 = (jnp.zeros((self.batch, self.p_tokens, self.cfg.attn_head_out),
                             self.prec.compute_dtype)
                   if first else self._feat_k2)
        self.mem, self._feat_prev, out = self._fused(
            self.params, self.mem, self._feat_prev, feat_k2, img, first,
            compute_res2=False)
        self._feat_k2 = out.feat_k2
        self._last_hooks = out.dec2_hooks
        return {"res1": out.res1,
                "res2": self.target_prediction() if want_res2 else None}

    def target_prediction(self) -> Optional[Dict[str, jax.Array]]:
        """res2 (current-frame prediction) from the carried decoder hook
        states — the deferred head, run on demand."""
        if self._last_hooks is None:
            return None
        return self._head2_jit(self.params, self._last_hooks)

    def run(self, frames) -> list:
        """frames: (T, B, H, W, 3) array or list of (B, H, W, 3).

        Returns the reference-style `preds` list: one dict per frame, all
        pointmaps in frame-0 coordinates (ref spann3r/model.py:523-534).
        The target head runs ONCE at end-of-stream on the carried hook
        states (every earlier res2 is discarded by this contract anyway).
        """
        self.reset()
        preds = []
        pending = self.put_frame(frames[0])
        for i in range(len(frames)):
            cur, pending = pending, (self.put_frame(frames[i + 1])
                                     if i + 1 < len(frames) else None)
            out = self.step(cur)
            if out is None:
                continue
            res1 = out["res1"]
            if not preds:
                preds.append({"pts3d": res1["pts3d"], "conf": res1["conf"]})
            else:
                preds.append({"pts3d_in_other_view": res1["pts3d"],
                              "conf": res1["conf"]})
        last_res2 = self.target_prediction()
        if last_res2 is not None:
            preds.append({"pts3d_in_other_view": last_res2["pts3d"],
                          "conf": last_res2["conf"]})
        return preds

    def run_video(self, frames, chunk: int = 16) -> list:
        """Chunked on-device scan over a whole video — same output contract
        as run(), far fewer host<->device round trips (critical when the
        chip is reached through a network tunnel: every dispatch round-trips
        its outputs, so the memory state must stay inside the program).

        frames: (T, B, H, W, 3) float (normalized) or uint8.
        """
        import numpy as np

        t = len(frames)
        carry = init_video_carry(self.cfg, self.img_hw, self.batch, self.prec)
        res1_chunks = []
        for s in range(0, t, chunk):
            part = np.asarray(frames[s:s + chunk])
            valid = np.ones(len(part), bool)
            if len(part) < chunk:  # pad the tail chunk
                pad = chunk - len(part)
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            carry, ys = self._scan_chunk(self.params, carry,
                                         jnp.asarray(part), jnp.asarray(valid))
            # start the device->host copy NOW and keep computing: the next
            # chunk only depends on `carry`, so its dispatch overlaps this
            # chunk's output transfer (through the tunnel the fetch runs at
            # ~40MB/s — serial fetches would idle the chip several seconds
            # per 192-frame scan; on local hosts this still hides PCIe).
            jax.tree.map(lambda a: a.copy_to_host_async(), ys)
            res1_chunks.append(ys)

        ys = {k: np.concatenate([np.asarray(c[k]) for c in res1_chunks])
              for k in res1_chunks[0]}
        emitted = ys["emitted"]
        preds = []
        for i in range(len(emitted)):
            if not emitted[i]:
                continue
            key = "pts3d" if not preds else "pts3d_in_other_view"
            preds.append({key: np.asarray(ys["pts3d"][i], np.float32),
                          "conf": np.asarray(ys["conf"][i], np.float32)})
        if not preds:  # no pair was ever formed (e.g. a 1-frame video)
            return []
        # deferred target-frame head: once per video on the carried states
        res2 = self._head2_jit(self.params, carry[3])
        preds.append({"pts3d_in_other_view":
                      np.asarray(res2["pts3d"], np.float32),
                      "conf": np.asarray(res2["conf"], np.float32)})
        return preds

"""Component-level timing of the streaming reconstruction path on the TPU.

Times each stage of scan_video_chunk in isolation (per-iteration sync, so
the chained-dispatch timing anomaly documented in CLAUDE.md cannot bite)
and reports a ms/frame breakdown + an MFU estimate from XLA's own
cost_analysis. Guides the perf work for VERDICT round-1 item #2.

Usage: python tools/perf_ablate.py [--only full,encode,...] [--reps 6]
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

PEAK_BF16 = {  # dense bf16 TFLOP/s per chip
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6e": 918e12,
}


def sync(x):
    """Wait for x by fetching ONE element (block_until_ready is a no-op
    through the axon tunnel — verified: it reports 0.01ms/frame for a
    0.5-TFLOP/frame program)."""
    import jax
    leaves = jax.tree.leaves(x)
    np.asarray(leaves[0].ravel()[0])
    if len(leaves) > 1:
        np.asarray(leaves[-1].ravel()[0])


def timed(fn, reps, *mk_args):
    """fn(*args) -> out; mk_args regenerated per rep when callable."""
    import jax
    ts = []
    for _ in range(reps):
        args = [a() if callable(a) else a for a in mk_args]
        sync(args)
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pallas", action="store_true",
                    help="enable the Pallas memread kernel")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list: encode,decode,pair,full,memread,memwrite")
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    if args.pallas:
        import os
        os.environ["SPANN3R_PALLAS_MEMREAD"] = "1"

    import jax
    import jax.numpy as jnp
    from spann3r_tpu.config import BF16, Spann3RConfig
    from spann3r_tpu.models import dust3r as d3
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.models.memory import (MemoryState, add_mem_check,
                                           init_memory, memory_read)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    peak = PEAK_BF16.get(dev.device_kind, 197e12)

    hw = (args.height, args.width)
    prec = BF16
    cfg = Spann3RConfig()
    dcfg = cfg.dust3r
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)

    chunk, b = args.chunk, 1
    p_tokens = (hw[0] // 16) * (hw[1] // 16)
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 256, (chunk, b, *hw, 3)).astype(np.uint8)
    frames = jax.device_put(jnp.asarray(frames_np))
    results = {}

    def run(name, label, build):
        if want is not None and name not in want:
            return
        t_build0 = time.perf_counter()
        fn, mk_args, per = build()
        out = fn(*[a() if callable(a) else a for a in mk_args])
        sync(out)
        compile_s = time.perf_counter() - t_build0
        med, ts = timed(fn, args.reps, *mk_args)
        ms = med / per * 1e3
        results[name] = ms
        print(f"{name:10s} {label:44s} {ms:8.2f} ms/frame "
              f"(median of {args.reps}, compile {compile_s:.0f}s, "
              f"spread {min(ts)/per*1e3:.2f}-{max(ts)/per*1e3:.2f})")

    # -- batched encoder over the chunk ------------------------------------
    def build_encode():
        def f(p, imgs):
            flat = (imgs.reshape(chunk * b, *hw, 3).astype(jnp.bfloat16)
                    * (2.0 / 255.0) - 1.0)
            feats, pos = d3.encode_image(p["dust3r"], flat, dcfg, prec)
            return feats
        return jax.jit(f), (params, frames), chunk

    run("encode", f"ViT-L encode, batched x{chunk}", build_encode)

    # -- per-frame decode core: dual decoder + attn heads (no heads/value) --
    def build_decode():
        feats, pos = jax.jit(lambda p: d3.encode_image(
            p["dust3r"], (frames.reshape(chunk * b, *hw, 3)
                          .astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0),
            dcfg, prec))(params)
        feats = feats.reshape(chunk, b, p_tokens, -1)
        pos = pos[:b]

        def f(p, feats_all):
            def body(feat_prev, feat2):
                dec1, dec2 = d3.decoder(p["dust3r"], feat_prev, pos, feat2,
                                        pos, dcfg, prec)
                k1 = sp.attn_head_apply(p["attn_head_1"], feat_prev, dec1[-1])
                k2 = sp.attn_head_apply(p["attn_head_2"], feat2, dec2[-1])
                return feat2, (dec1[-1].astype(jnp.bfloat16), k1[..., :1], k2[..., :1])
            _, ys = jax.lax.scan(body, feats_all[0], feats_all)
            return ys[0]
        return jax.jit(f), (params, feats), chunk

    run("decode", "dual-decoder + attn-head MLPs scan", build_decode)

    # -- per-frame full pair_step (adds heads + value encoder) --------------
    def build_pair():
        feats, pos = jax.jit(lambda p: d3.encode_image(
            p["dust3r"], (frames.reshape(chunk * b, *hw, 3)
                          .astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0),
            dcfg, prec))(params)
        feats = feats.reshape(chunk, b, p_tokens, -1)
        pos = pos[:b]

        def f(p, feats_all):
            def body(feat_prev, feat2):
                out = sp.pair_step(p, cfg, feat_prev, feat_prev, feat2, pos,
                                   hw, prec)
                return feat2, (out.res1["pts3d"].astype(jnp.bfloat16),
                               out.cur_v[..., :1])
            _, ys = jax.lax.scan(body, feats_all[0], feats_all)
            return ys[0]
        return jax.jit(f), (params, feats), chunk

    run("pair", "decode + 2xDPT heads + value-encoder scan", build_pair)

    # -- memory read at steady-state occupancy ------------------------------
    capacity = cfg.memory.capacity(p_tokens)
    norms = {k: params[k] for k in ("norm_q", "norm_k", "norm_v")}

    def steady_mem():
        m = init_memory(b, capacity, cfg.attn_head_out, dtype=jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((b, capacity, 1024)), jnp.bfloat16)
        vv = jnp.asarray(rng.standard_normal((b, capacity, 1024)), jnp.bfloat16)
        sz = cfg.memory.long_mem_size + cfg.memory.work_mem_size * p_tokens
        return MemoryState(kk, vv, m.count + 1.0, m.attn,
                           jnp.full((b,), sz, jnp.int32),
                           jnp.full((b,), cfg.memory.work_mem_size, jnp.int32),
                           jnp.full((b,), cfg.memory.long_mem_size, jnp.int32))

    q = jnp.asarray(rng.standard_normal((b, p_tokens, 1024)), jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal((chunk, b, p_tokens, 1024)),
                     jnp.bfloat16)

    # fixed per-dispatch tunnel cost: a trivial program, timed the same way
    def build_overhead():
        f = jax.jit(lambda x: x + 1.0)
        return f, (jnp.zeros(()),), 1

    run("overhead", "trivial dispatch+sync round trip", build_overhead)

    # small ops iterated x32 INSIDE one program so the tunnel cost amortizes
    def build_memread():
        def f(n, m, qs):
            def body(m, q):
                out, m = memory_read(n, m, q,
                                     attn_thresh=cfg.memory.attn_thresh)
                return m, out[..., :1]
            m, outs = jax.lax.scan(body, m, qs)
            return outs
        return jax.jit(f), (norms, steady_mem(), qs), chunk

    run("memread", f"memory_read x{chunk} in-scan, bank C={capacity}",
        build_memread)

    def build_memwrite():
        def f(m, qs):
            def body(m, q):
                m = add_mem_check(m, q, q, cfg.memory)
                # output must depend on m or XLA DCEs the whole chain
                return m, m.k[0, 0, 0]
            m, outs = jax.lax.scan(body, m, qs)
            return outs
        return jax.jit(f, donate_argnums=(0,)), (steady_mem, qs), chunk

    run("memwrite", f"add_mem_check x{chunk} in-scan (dedup+spill+prune)",
        build_memwrite)

    # -- full scan minus the memory bank: isolates bank cost in context -----
    def build_fullnomem():
        def f(p, imgs, feat0):
            flat = (imgs.reshape(chunk * b, *hw, 3).astype(jnp.bfloat16)
                    * (2.0 / 255.0) - 1.0)
            feats_all, pos = d3.encode_image(p["dust3r"], flat, dcfg, prec)
            feats_all = feats_all.reshape(chunk, b, p_tokens, -1)
            pos = pos[:b]

            def body(feat_prev, feat2):
                out = sp.pair_step(p, cfg, feat_prev, feat_prev, feat2, pos,
                                   hw, prec)
                ys = {"pts3d": out.res1["pts3d"].astype(jnp.bfloat16),
                      "conf": out.res1["conf"].astype(jnp.bfloat16)}
                return feat2, ys
            _, ys = jax.lax.scan(body, feat0, feats_all)
            return ys["conf"]

        feat0 = jnp.zeros((b, p_tokens, dcfg.enc.dim), jnp.bfloat16)
        return jax.jit(f), (params, frames, feat0), chunk

    run("fullnomem", "encode + pair scan + emission (no memory bank)",
        build_fullnomem)

    # -- isolated check_sim / memory_prune (suspected slow row-gathers) -----
    def build_checksim():
        from spann3r_tpu.models.memory import check_sim

        def f(m, qs):
            def body(m, qq):
                dup = check_sim(m, qq, p_tokens, cfg.memory.work_mem_size,
                                cfg.memory.sim_thresh)
                m = m._replace(attn=m.attn + dup[:, None])
                return m, dup
            m, outs = jax.lax.scan(body, m, qs)
            return m.attn[0, 0]
        return jax.jit(f, donate_argnums=(0,)), (steady_mem, qs), chunk

    run("checksim", f"check_sim x{chunk} in-scan (window gather + cosine)",
        build_checksim)

    def build_prune():
        from spann3r_tpu.models.memory import memory_prune

        def f(m, qs):
            def body(m, qq):
                m2 = memory_prune(m, cfg.memory)
                # keep size/count alive so the next iter isn't constant
                m2 = m2._replace(size=m.size, attn=m2.attn + qq[0, 0, 0])
                return m2, qq[0, 0, 0]
            m, outs = jax.lax.scan(body, m, qs)
            return m.k[0, 0, 0]
        return jax.jit(f, donate_argnums=(0,)), (steady_mem, qs), chunk

    run("prune", f"memory_prune x{chunk} in-scan (top_k + row gather)",
        build_prune)

    # -- full-body variants bisecting the in-context memory cost ------------
    def build_full_variant(write_mode, selects):
        from spann3r_tpu.models.memory import _append
        from spann3r_tpu.models.spann3r import _memory_norms

        def f(p, carry, imgs, valid_v):
            flat = (imgs.reshape(chunk * b, *hw, 3).astype(jnp.bfloat16)
                    * (2.0 / 255.0) - 1.0)
            feats_all, pos = d3.encode_image(p["dust3r"], flat, dcfg, prec)
            feats_all = feats_all.reshape(chunk, b, p_tokens, -1)
            pos = pos[:b]

            def body(c, step):
                m, feat_prev, feat_k2 = c
                feat2, valid = step
                fused, m_read = memory_read(_memory_norms(p), m, feat_k2,
                                            attn_thresh=cfg.memory.attn_thresh)
                if selects:
                    m = jax.tree.map(lambda a_, b_: jnp.where(valid, a_, b_),
                                     m_read, m)
                else:
                    m = m_read
                out = sp.pair_step(p, cfg, fused, feat_prev, feat2, pos,
                                   hw, prec)
                if write_mode == "append":
                    written = _append(m, out.feat_k1, out.cur_v + out.feat_k1)
                    written = written._replace(
                        size=jnp.minimum(written.size, capacity - p_tokens))
                else:
                    written = add_mem_check(m, out.feat_k1,
                                            out.cur_v + out.feat_k1,
                                            cfg.memory)
                if selects:
                    m = jax.tree.map(lambda a_, b_: jnp.where(valid, a_, b_),
                                     written, m)
                else:
                    m = written
                ys = {"pts3d": out.res1["pts3d"].astype(jnp.bfloat16),
                      "conf": out.res1["conf"].astype(jnp.bfloat16)}
                return (m, feat2, out.feat_k2), ys

            c, ys = jax.lax.scan(body, carry, (feats_all, valid_v))
            return c, ys["conf"]

        scan = jax.jit(f, donate_argnums=(1,))
        mem0 = steady_mem()
        feat0 = jnp.zeros((b, p_tokens, dcfg.enc.dim), jnp.bfloat16)
        carry_box = [(mem0, feat0, q + 0)]  # copy: the carry is donated
        valid_v = jnp.ones(chunk, bool)

        def g(p, im, v):
            carry_box[0], conf = scan(p, carry_box[0], im, v)
            return conf
        return g, (params, frames, valid_v), chunk

    run("fullappend", "full body, append-only write, selects kept",
        lambda: build_full_variant("append", True))
    run("fullnosel", "full body, real write, no where-selects",
        lambda: build_full_variant("check", False))

    # -- the real thing: scan_video_chunk, per-chunk sync --------------------
    def build_full():
        scan = jax.jit(
            lambda p, c, im, v: sp.scan_video_chunk(p, cfg, c, im, v, hw, prec),
            donate_argnums=(1,))
        valid = jnp.ones(chunk, bool)
        carry_box = [sp.init_video_carry(cfg, hw, b, prec)]
        # pre-fill memory to steady state with one warm chunk happens in the
        # first (untimed) call made by run()

        def f(p, im, v):
            carry_box[0], ys = scan(p, carry_box[0], im, v)
            return ys["conf"]
        try:
            lowered = scan.lower(params, carry_box[0], frames, valid)
            fl = lowered.compile().cost_analysis()
            if isinstance(fl, list):
                fl = fl[0]
            results["flops_per_frame"] = fl.get("flops", 0.0) / chunk
        except Exception as e:  # cost analysis is best-effort
            print(f"  (cost_analysis unavailable: {e})")
        return f, (params, frames, valid), chunk

    run("full", "scan_video_chunk end-to-end", build_full)

    print()
    if "full" in results:
        known = sum(results.get(k, 0.0) for k in ("encode", "pair"))
        print(f"full - (encode+pair) = "
              f"{results['full'] - known:.2f} ms/frame memory+overhead")
        if results.get("flops_per_frame"):
            fpf = results["flops_per_frame"]
            mfu = fpf / (results["full"] * 1e-3) / peak
            print(f"XLA-counted {fpf/1e9:.1f} GFLOP/frame -> "
                  f"MFU {mfu*100:.1f}% of {peak/1e12:.0f} TF/s peak")
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()

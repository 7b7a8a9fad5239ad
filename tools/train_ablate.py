"""Train-step timing/MFU ablation on the real TPU chip.

Times the full-size training step (ViT-L + dual ViT-B + DPT heads, B x T
@224, full backprop) under different rematerialization policies and
reports ms/step, samples/s, and an analytic MFU.  Per-rep sync (fetch one
element of an output) so the tunnel's chained-dispatch anomaly cannot
bite (CLAUDE.md).

FLOP accounting: forward matmul FLOPs are counted analytically with
bench.model_flops_per_frame (cost_analysis undercounts scan bodies);
backward = 2x forward; block remat (the default policy) recomputes the
forward once more inside the backward -> 4x forward total.  Non-matmul
FLOPs ignored.

Usage: python tools/train_ablate.py [--batch 4] [--frames 5]
       [--variants default,dots,none] [--profile DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bench import PEAK_BF16, model_flops_per_frame  # noqa: E402


def sync(tree):
    import jax
    leaves = jax.tree.leaves(tree)
    np.asarray(leaves[0].ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--resolution", type=int, default=224)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", type=str, default="default,dots,none")  # also: pairremat
    ap.add_argument("--head_type", type=str, default="dpt")
    ap.add_argument("--bf16_heads", action="store_true",
                    help="BF16_FAST precision (bf16 DPT heads): opt-in "
                         "deviation from the reference fp32-heads policy")
    ap.add_argument("--profile", type=str, default=None,
                    help="profile the first listed variant's steps to this dir")
    ap.add_argument("--pipelined", type=int, default=0,
                    help="additionally run N steps enqueued back-to-back "
                         "with no per-step sync (production-loop protocol) "
                         "under the profiler; inter-step device gaps in the "
                         "trace are the pipelining evidence")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spann3r_tpu import losses, training as tr
    from spann3r_tpu.config import (BF16, BF16_FAST, DUSt3RConfig,
                                    Spann3RConfig)
    from spann3r_tpu.models import spann3r as sp

    hw = (args.resolution, args.resolution)
    cfg = Spann3RConfig(dust3r=DUSt3RConfig(img_size=hw,
                                            head_type=args.head_type))
    dev = jax.devices()[0]
    peak = PEAK_BF16.get(dev.device_kind, 197e12)
    print(f"device: {dev.device_kind}; B={args.batch} T={args.frames} @{hw}")

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((t, b, *hw, 3)), jnp.float32) * 0.3,
        "pts3d": jnp.asarray(rng.standard_normal((t, b, *hw, 3)), jnp.float32) + 2,
        "valid_mask": jnp.ones((t, b, *hw), bool),
        "camera_pose": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                        (t, b, 4, 4)),
    }

    # fwd matmul flops: (t-1) pair steps, each = one frame's streaming step
    # minus the memory-read term (training bank is tiny vs serving)
    prec = BF16_FAST if args.bf16_heads else BF16
    fwd = model_flops_per_frame(cfg, hw, b, prec) * (t - 1)

    # encoder fraction of forward matmul FLOPs (for the encsave variant's
    # recompute accounting: its backward skips the encoder recompute)
    p_tok = (hw[0] // cfg.dust3r.patch_size) * (hw[1] // cfg.dust3r.patch_size)
    e = cfg.dust3r.enc

    def _block(n, d, r=4):
        return 8 * n * d * d + 4 * n * n * d + 4 * n * d * int(r * d)

    enc_frac = (e.depth * _block(p_tok, e.dim) * b) \
        / model_flops_per_frame(cfg, hw, b, prec)

    # master params live on HOST: train_step donates its params, so each
    # variant needs a fresh device copy — but keeping a device-side master
    # pins an extra ~2.7 GB of fp32 weights for the whole run (enough to
    # OOM the 16 GB chip at B=4 @224)
    params0 = jax.tree.map(np.asarray,
                           sp.init_spann3r(jax.random.PRNGKey(0), cfg))
    results = {}

    for variant in args.variants.split(","):
        os.environ.pop("SPANN3R_REMAT_POLICY", None)
        os.environ.pop("SPANN3R_REMAT_SCAN", None)
        os.environ.pop("SPANN3R_NO_REMAT_ENC", None)
        os.environ.pop("SPANN3R_GRADS_BF16", None)
        os.environ.pop("SPANN3R_UNROLL_TSCAN", None)
        remat = True
        moment_dtype = None
        chain_opt = False
        recompute_factor = 1.0
        # composable: "pairremat+attn" = scan-level remat with the attn
        # block policy applied inside the recomputed step
        for part in variant.split("+"):
            if part == "pairremat":
                # checkpoint the whole pair-step scan body on top of
                # per-block remat: backward recomputes the step once more
                os.environ["SPANN3R_REMAT_SCAN"] = "1"
                recompute_factor += 1.0
            elif part == "dots":
                os.environ["SPANN3R_REMAT_POLICY"] = "dots"
                recompute_factor -= 0.65  # elementwise-only recompute
            elif part == "attn":
                # attention chain saved by name; backward recomputes norms
                # + the MLP fc1 matmul only (~4/12 of block matmul FLOPs)
                os.environ["SPANN3R_REMAT_POLICY"] = "attn"
                recompute_factor -= 0.6
            elif part == "nomlp":
                os.environ["SPANN3R_REMAT_POLICY"] = "nomlp"
                recompute_factor -= 0.65
            elif part == "encsave":
                # keep encoder activations resident; backward skips the
                # encoder recompute (models/spann3r.py forward_train)
                os.environ["SPANN3R_NO_REMAT_ENC"] = "1"
                recompute_factor -= enc_frac
            elif part == "tunroll":
                # fully unroll the (T-1)-iteration pair-step scan so XLA
                # fuses the shared-weight grad-accumulation adds (the
                # forward_train DEFAULT for T-1 <= 4 since r5 — explicit
                # here for longer-T A/Bs)
                os.environ["SPANN3R_UNROLL_TSCAN"] = str(args.frames - 1)
            elif part == "tscan":
                # rolled pair-step loop (the pre-r5 default), the A/B
                # control for the unrolled forward_train default
                os.environ["SPANN3R_UNROLL_TSCAN"] = "1"
            elif part == "gradsbf16":
                # bf16 working params + bf16 grads, fp32 master
                # (training.work_params): halves scan-transpose grad
                # traffic + fwd/remat/bwd param reads; no FLOP change
                os.environ["SPANN3R_GRADS_BF16"] = "1"
            elif part == "adambf16":
                # bf16 Adam-moment storage (training.make_optimizer):
                # halves optimizer-state HBM traffic; no FLOP change
                import jax.numpy as _jnp
                moment_dtype = _jnp.bfloat16
            elif part == "chainopt":
                # the r3 optimizer: an optax.chain of 4 transforms
                # (clip -> scale_by_adam -> add_decayed_weights), kept
                # here as the A/B control for the fused single-pass
                # make_optimizer — same math, extra materialized
                # intermediate pytrees between stages
                chain_opt = True
            elif part == "none":
                remat = False
                recompute_factor -= 1.0
            else:
                assert part == "default", f"unknown variant {part!r}"
        total_flops = fwd * (3.0 + recompute_factor)

        try:
            if chain_opt:
                import optax
                opt = optax.chain(
                    optax.clip_by_global_norm(1.0),
                    optax.scale_by_adam(b1=0.9, b2=0.95),
                    optax.add_decayed_weights(0.05, mask=tr.decay_mask))
            else:
                opt = tr.make_optimizer(0.05, moment_dtype=moment_dtype)
            step = tr.make_train_step(cfg, prec, opt, remat=remat)
            params = jax.tree.map(jnp.asarray, params0)
            opt_state = opt.init(params)
            key = jax.random.PRNGKey(1)
            # compile + first step
            t0 = time.perf_counter()
            params, opt_state, m = step(params, opt_state, batch, key,
                                        jnp.float32(1e-5), jnp.float32(0.4))
            sync(m["loss"])
            compile_s = time.perf_counter() - t0
            ts = []
            # profile the first listed variant (historically 'default')
            prof = args.profile if (
                args.profile and variant == args.variants.split(",")[0]) else None
            if prof:
                jax.profiler.start_trace(prof)
            for _ in range(args.reps):
                t0 = time.perf_counter()
                params, opt_state, m = step(params, opt_state, batch, key,
                                            jnp.float32(1e-5),
                                            jnp.float32(0.4))
                sync(m["loss"])
                ts.append(time.perf_counter() - t0)
            if prof:
                jax.profiler.stop_trace()
            pipe = {}
            if args.pipelined:
                # production-loop protocol: enqueue all steps back-to-back
                # with NO per-step host sync (the real train loop only
                # syncs for periodic metric logging), one sync at the end.
                # Wall time here is untrustworthy through the tunnel
                # (CLAUDE.md chained-dispatch anomaly) — the EVIDENCE is
                # the profiler device timeline (inter-step gaps), so this
                # mode requires --profile; gaps are analyzed offline.
                pdir = (args.profile or "/tmp/ablate_pipe") + "_pipelined"
                jax.profiler.start_trace(pdir)
                t0 = time.perf_counter()
                for _ in range(args.pipelined):
                    params, opt_state, m = step(params, opt_state, batch,
                                                key, jnp.float32(1e-5),
                                                jnp.float32(0.4))
                sync(m["loss"])
                wall = time.perf_counter() - t0
                jax.profiler.stop_trace()
                pipe = {"pipelined_steps": args.pipelined,
                        "pipelined_wall_ms_per_step":
                            round(wall / args.pipelined * 1e3, 1),
                        "pipelined_trace": pdir}
            med = float(np.median(ts))
            results[variant] = {
                "ms_per_step": round(med * 1e3, 1),
                "samples_per_s": round(b / med, 2),
                "mfu_pct": round(total_flops / med / peak * 100, 1),
                "compile_s": round(compile_s, 0),
                "spread_ms": [round(min(ts) * 1e3, 1), round(max(ts) * 1e3, 1)],
                **pipe,
            }
            print(variant, results[variant], flush=True)
            del params, opt_state, step
        except Exception as e:  # OOM etc.
            results[variant] = {"error": str(e)[:200]}
            print(variant, "FAILED:", str(e)[:200], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

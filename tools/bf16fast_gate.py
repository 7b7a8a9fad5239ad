"""End-to-end BF16_FAST (bf16 heads) serving accuracy gate (VERDICT r4 #7).

bench.py --bf16_heads ships an FPS number for the BF16_FAST precision
(config.py: bf16 compute AND bf16 DPT/attention heads, vs the default BF16's
fp32 heads).  int8 weight-only and int8-act both carry end-to-end chamfer
gates (tools/int8_gate.py); this gate gives the bf16-heads opt-in the same
evidence: run the REAL eval protocol (streaming reconstruction +
scale-shift-invariant alignment + accuracy/completion, the
eval.py / tools/eval_pipeline.py path) on procedural SynthRoom scenes under
BF16 and BF16_FAST and bound the chamfer delta.

Ref precision contract: /root/reference/spann3r/model.py:327-331 (the
reference runs heads in fp32 under autocast; bf16 heads are a TPU-serving
extra, so the bound here is ours).

Usage:
    python tools/bf16fast_gate.py [--ckpt output/conv_gate/checkpoints/checkpoint-best]
        [--out tests/data/bf16fast_gate_r5.json] [--rel_bound 0.05]
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


def main():
    ap = argparse.ArgumentParser("bf16-heads e2e accuracy gate")
    ap.add_argument("--ckpt", type=str,
                    default="output/conv_gate/checkpoints/checkpoint-best")
    ap.add_argument("--resolution", type=int, default=112)
    ap.add_argument("--n_scenes", type=int, default=3)
    ap.add_argument("--rel_bound", type=float, default=0.05,
                    help="max allowed relative chamfer regression "
                         "BF16_FAST vs BF16")
    ap.add_argument("--out", type=str,
                    default="tests/data/bf16fast_gate_r5.json")
    args = ap.parse_args()

    import jax

    from spann3r_tpu.config import BF16, BF16_FAST
    from spann3r_tpu.datasets import build_dataset
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.ops.quant import cast_serving_weights
    from spann3r_tpu.tools.convergence import synth_chamfer

    from convergence_gate import small_cfg  # tools/ sibling
    from int8_gate import load_gate_checkpoint

    res = args.resolution
    cfg = small_cfg(res)

    if osp.isdir(args.ckpt):
        params = load_gate_checkpoint(args.ckpt, cfg)
        source = args.ckpt
    else:
        print(f"WARNING: {args.ckpt} not found - random init "
              f"(pipeline-consistency mode only)")
        params = jax.tree.map(np.asarray,
                              sp.init_spann3r(jax.random.PRNGKey(0), cfg))
        source = "random_init"

    ds = build_dataset(f"SynthRoom(num_seq={args.n_scenes}, resolution={res}, "
                       f"seq_len=16, kf_every=2, full_video=True, "
                       f"scene_seed=9)")

    t0 = time.time()
    serving_params = jax.device_put(cast_serving_weights(params))
    m_bf16 = synth_chamfer(serving_params, cfg, BF16, ds, args.n_scenes)
    m_fast = synth_chamfer(serving_params, cfg, BF16_FAST, ds, args.n_scenes)

    rel = (m_fast["chamfer"] - m_bf16["chamfer"]) / max(m_bf16["chamfer"],
                                                        1e-9)
    artifact = {
        "ckpt": source, "resolution": res, "n_scenes": args.n_scenes,
        "bf16": m_bf16, "bf16_fast": m_fast,
        "chamfer_rel_delta": rel, "rel_bound": args.rel_bound,
        "pass": bool(rel <= args.rel_bound),
        "wall_s": time.time() - t0,
        "date": time.strftime("%Y-%m-%d"),
    }
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, default=float)

    print(f"\n=== bf16-heads e2e gate ({artifact['wall_s']:.0f}s, "
          f"ckpt={source}) ===")
    print(f"BF16      chamfer: {m_bf16['chamfer']:.4f} "
          f"(acc {m_bf16['acc']:.4f} comp {m_bf16['comp']:.4f})")
    print(f"BF16_FAST chamfer: {m_fast['chamfer']:.4f} "
          f"(acc {m_fast['acc']:.4f} comp {m_fast['comp']:.4f})")
    print(f"relative delta: {rel:+.4%} (bound {args.rel_bound:.0%})")
    print("GATE:", "PASS" if artifact["pass"] else "FAIL")
    sys.exit(0 if artifact["pass"] else 1)


if __name__ == "__main__":
    main()

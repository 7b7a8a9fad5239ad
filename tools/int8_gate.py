"""End-to-end int8 serving accuracy gate (VERDICT r3 item 6).

The README's int8 FPS headline needs an accuracy statement next to it.
This gate runs the REAL eval protocol (streaming reconstruction +
scale-shift-invariant alignment + accuracy/completion metrics, the
eval.py / tools/eval_pipeline.py path) on procedural SynthRoom scenes
twice — bf16 serving weights vs int8 weight-only quantized
(ops/quant.py) — and requires the chamfer delta to stay inside a stated
bound.  By default it loads the checkpoint the synthetic convergence
gate trained (tools/convergence_gate.py), so the comparison runs on
weights that actually reconstruct, not random init.

Ref baseline protocol: /root/reference/eval.py:203-218 (the reference
publishes accuracy/completion medians per scene; it has no quantized
path — int8 is a TPU-serving extra, so the bound here is ours).

Usage:
    python tools/int8_gate.py [--ckpt output/conv_gate/checkpoints/checkpoint-best]
        [--out tests/data/int8_gate_r4.json] [--rel_bound 0.05]
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


def load_gate_checkpoint(path: str, cfg):
    """Restore params from an orbax checkpoint dir saved by
    training.CheckpointManager (structure {'params', 'opt_state', ...});
    restores WITHOUT a template so it tolerates optimizer-state layout
    changes between the saving and reading code versions."""
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore(osp.abspath(path))
    return raw["params"]


def main():
    ap = argparse.ArgumentParser("int8 e2e accuracy gate")
    ap.add_argument("--ckpt", type=str,
                    default="output/conv_gate/checkpoints/checkpoint-best")
    ap.add_argument("--resolution", type=int, default=112)
    ap.add_argument("--n_scenes", type=int, default=3)
    ap.add_argument("--rel_bound", type=float, default=0.05,
                    help="max allowed relative chamfer regression int8 vs bf16")
    ap.add_argument("--min_dim", type=int, default=256,
                    help="quantize_linear_weights min matrix dim. The "
                         "production default (512) targets ViT-L/B widths; "
                         "the gate's small config is 384-wide, so the gate "
                         "lowers it — otherwise NOTHING quantizes and the "
                         "comparison is vacuous (the gate fails on nq==0)")
    ap.add_argument("--act", type=int, default=0,
                    help="also enable int8 ACTIVATION compute for the int8 "
                         "arm (ops/layers.py linear int8 MXU path); value = "
                         "min-rows floor passed as SPANN3R_INT8_ACT. The "
                         "production floor (1024) targets 512-res encoder "
                         "batches; the gate's small config batches fewer "
                         "rows, so pass e.g. --act 256")
    ap.add_argument("--out", type=str, default="tests/data/int8_gate_r4.json")
    args = ap.parse_args()

    if args.act:
        os.environ["SPANN3R_INT8_ACT"] = str(args.act)

    import jax

    from spann3r_tpu.config import BF16
    from spann3r_tpu.datasets import build_dataset
    from spann3r_tpu.models import spann3r as sp
    from spann3r_tpu.ops.quant import (cast_serving_weights, count_quantized,
                                       quantize_linear_weights)
    from spann3r_tpu.tools.convergence import synth_chamfer

    # model config must match the checkpoint: the convergence gate's small
    # production-topology config at --resolution
    from convergence_gate import small_cfg  # tools/ sibling
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
    bf16_params = jax.device_put(cast_serving_weights(params))
    m_bf16 = synth_chamfer(bf16_params, cfg, BF16, ds, args.n_scenes)
    del bf16_params
    int8_params = jax.device_put(quantize_linear_weights(
        cast_serving_weights(params), min_dim=args.min_dim))
    nq = count_quantized(int8_params)
    assert nq > 0, (f"no matrices quantized at min_dim={args.min_dim} — "
                    f"the bf16-vs-int8 comparison would be vacuous")
    m_int8 = synth_chamfer(int8_params, cfg, BF16, ds, args.n_scenes)

    rel = (m_int8["chamfer"] - m_bf16["chamfer"]) / max(m_bf16["chamfer"],
                                                        1e-9)
    artifact = {
        "ckpt": source, "resolution": res, "n_scenes": args.n_scenes,
        "quantized_matrices": nq, "int8_act_min_rows": args.act,
        "bf16": m_bf16, "int8": m_int8,
        "chamfer_rel_delta": rel, "rel_bound": args.rel_bound,
        "pass": bool(rel <= args.rel_bound),
        "wall_s": time.time() - t0,
        "date": time.strftime("%Y-%m-%d"),
    }
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, default=float)

    print(f"\n=== int8 e2e gate ({artifact['wall_s']:.0f}s, {nq} matrices "
          f"quantized, ckpt={source}) ===")
    print(f"bf16 chamfer: {m_bf16['chamfer']:.4f} "
          f"(acc {m_bf16['acc']:.4f} comp {m_bf16['comp']:.4f})")
    print(f"int8 chamfer: {m_int8['chamfer']:.4f} "
          f"(acc {m_int8['acc']:.4f} comp {m_int8['comp']:.4f})")
    print(f"relative delta: {rel:+.4%} (bound {args.rel_bound:.0%})")
    print("GATE:", "PASS" if artifact["pass"] else "FAIL")
    sys.exit(0 if artifact["pass"] else 1)


if __name__ == "__main__":
    main()

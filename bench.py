"""Benchmark: incremental reconstruction FPS at 512-res on the TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >=20 FPS incremental reconstruction at 512-res
(BASELINE.md north-star; the reference repo publishes no FPS number).

Measures the steady-state streaming step of the flagship model (ViT-L
encoder + dual ViT-B decoders + DPT heads + full spatial-memory
read/dedup/spill/prune) after compile warmup, with the memory bank
pre-filled to a realistic working+long-term occupancy.
"""
import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 20.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from spann3r_tpu.config import BF16, Spann3RConfig
    from spann3r_tpu.models import spann3r as sp

    hw = (args.height, args.width)
    cfg = Spann3RConfig()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    # serve in bf16: cast params once (heads are force-fp32 internally)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)

    engine = sp.InferenceEngine(params, cfg, hw, BF16)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (args.frames, 1, *hw, 3)).astype(np.uint8)

    # warmup: compile the fused step variants and fill the memory
    for i in range(args.warmup):
        engine.step(engine.put_frame(frames[i % len(frames)]))
    np.asarray(engine.mem.size)  # full sync through the tunnel
    engine.reset()

    t0 = time.perf_counter()
    out = None
    pending = engine.put_frame(frames[0])
    for i in range(args.frames):
        cur = pending
        if i + 1 < args.frames:
            pending = engine.put_frame(frames[i + 1])  # overlap transfer
        out = engine.step(cur)
    np.asarray(out["res1"]["pts3d"][0, 0, 0])  # force completion
    elapsed = time.perf_counter() - t0

    fps = args.frames / elapsed
    print(json.dumps({
        "metric": f"incremental_recon_fps_{args.width}x{args.height}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

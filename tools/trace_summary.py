#!/usr/bin/env python3
"""Summarize a jax.profiler trace: device ops ranked by total duration.

Wall-clock microbenchmarks under ~31 ms device time are relay-latency
floored in this environment (see BENCHMARKS.md "Timing methodology"), so
kernel/op attribution must come from device traces. Usage:

    with jax.profiler.trace("/tmp/trace"):  # around warmed-up steps
        ...
    /opt/venv/bin/python3 tools/trace_summary.py /tmp/trace [--top 30]

Prints per-op totals and call counts for the device lanes, plus host-side
entries for context. Divide by the number of steps you traced.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def find_trace(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(
        root, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return hits[-1]


def summarize(path: str, top: int = 30):
    data = json.load(gzip.open(path))
    events = data["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            key = (names.get(e.get("pid"), e.get("pid")), e["name"])
            agg[key] += e["dur"]
            cnt[key] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"{'total ms':>9}  {'calls':>6}  lane / op")
    shown = host_shown = 0
    for (proc, name), dur in rows:
        is_dev = "TPU" in str(proc) or "GPU" in str(proc)
        if not is_dev:
            # cap HOST rows only (they dominate raw totals but rarely
            # matter) — device rows always flow up to --top, and a trace
            # with no device lanes still honors --top on host rows
            host_shown += 1
            if host_shown > 6 and any(
                    "TPU" in str(p) or "GPU" in str(p) for p, _ in agg):
                continue
        print(f"{dur/1000:9.2f}  {cnt[(proc, name)]:6d}  [{proc}] "
              f"{name[:100]}")
        shown += 1
        if shown >= top:
            break


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    summarize(find_trace(args.trace_dir), args.top)

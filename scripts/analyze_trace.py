"""Summarize device-time buckets from a jax.profiler perfetto trace.

Usage: python scripts/analyze_trace.py /tmp/trace_step [top_n]
Finds the newest *.trace.json.gz under the dir, sums durations of TPU
device-track events, and prints per-bucket and per-op breakdowns.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def bucket(name: str) -> str:
    n = name.lower()
    if "flash" in n:
        return "flash_attention"
    if n.startswith("copy") or ".copy" in n or "transpose" in n:
        return "copy/transpose"
    if "conv" in n and "fusion" in n:
        return "convolution-fusion"
    if n.startswith("convolution"):
        return "convolution"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "reduce" in n or "convert" in n:
        return "reduce/convert"
    if "fusion" in n:
        return "elementwise-fusion"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "data-movement"
    return "other"


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    files = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    assert files, f"no trace.json.gz under {root}"
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)

    events = data["traceEvents"]
    # identify device-track pids: process names containing "TPU" / "Device"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"tpu|device|/device:", n, re.I)}
    if not device_pids:
        print("process names:", sorted(set(pid_names.values())))

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # skip trace-framework meta events
        if name.startswith(("XLA Modules", "XLA Ops", "Steps")):
            continue
        per_op[name] += dur
        per_bucket[bucket(name)] += dur
        total += dur

    print(f"\ntrack total: {total:.0f} ms (2 steps traced => /2 per step)")
    print("\n-- buckets (ms) --")
    for b, ms in per_bucket.most_common():
        print(f"{ms:9.1f}  {b}")
    print(f"\n-- top {top_n} ops (ms) --")
    for op, ms in per_op.most_common(top_n):
        print(f"{ms:9.1f}  {op[:110]}")


if __name__ == "__main__":
    main()

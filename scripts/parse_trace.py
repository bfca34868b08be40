#!/usr/bin/env python
"""Aggregate a jax.profiler trace (from trace_step.py) by op-name prefix."""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/seid_trace"
N_STEPS = 2


def main():
    files = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    # lane inventory
    lane_tot = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (pnames.get(e["pid"], "?"), tnames.get((e["pid"], e.get("tid")), e.get("tid")))
        lane_tot[key] += e.get("dur", 0) / 1000.0
    print("lanes (total ms over trace):")
    for k, v in sorted(lane_tot.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v:9.1f} ms  {k}")

    # aggregate TPU xla-op lane by prefix
    by_group = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pnames.get(e["pid"], ""):
            continue
        tn = str(tnames.get((e["pid"], e.get("tid")), ""))
        if "XLA Op" not in tn and not tn.strip().isdigit():
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.startswith("encoder"):
            continue  # enclosing spans, not leaf ops
        g = re.sub(r"[.\d]+$", "", nm)
        d = e.get("dur", 0) / 1000.0
        by_group[g][0] += d
        by_group[g][1] += 1
        total += d
    print(f"\nleaf op total: {total / N_STEPS:.1f} ms/step")
    for g, (ms, n) in sorted(by_group.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"  {ms / N_STEPS:8.2f} ms  x{n // N_STEPS:4d}  {g[:90]}")


if __name__ == "__main__":
    main()

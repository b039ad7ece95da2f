"""Shared trace-viewer parsing for the profiling scripts: group XLA-Ops
device time into hlo_category buckets (see docs/performance.md tables)."""

import glob
import gzip
import json
import re


def parse_trace(trace_dir, iters):
    """Returns (total_ms, buckets{cat: ms}, names{(cat,op,shape): ms}) per
    iteration, from the newest trace under trace_dir."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tids = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    buckets, names, total = {}, {}, 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if tids.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category", "?")
        ln = args.get("long_name", "")
        shape = re.search(r"= (\w+\[[0-9,]*\])", ln)
        dur = ev["dur"] / 1e3 / iters
        buckets[cat] = buckets.get(cat, 0.0) + dur
        key = (cat, ev["name"].split(".")[0],
               shape.group(1) if shape else "?")
        names[key] = names.get(key, 0.0) + dur
        total += dur
    return total, buckets, names


def print_profile(tag, parsed, top_n=25):
    total, buckets, names = parsed
    print(f"{tag}: total device {total:.1f} ms/iter")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:28s} {ms:7.2f} ms")
    print(f"top {top_n} ops (category, op, out shape):")
    for (b, name, shape), ms in sorted(names.items(),
                                       key=lambda kv: -kv[1])[:top_n]:
        print(f"  {ms:7.2f} ms  [{b}] {name} {shape}")

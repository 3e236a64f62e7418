#!/usr/bin/env python
"""Summarize a jax.profiler trace: device time bucketed by HLO op.

Usage:
    python tools/analyze_trace.py <trace_root> [top_k]

<trace_root> is the directory passed to jax.profiler.start_trace (e.g.
``<record_dir>/profile``); the newest ``plugins/profile/*/ *.trace.json.gz``
under it is analyzed.  Buckets the TensorCore lanes' complete events by a
normalized op name (fusion.123 -> fusion, dynamic-update-slice.5 ->
dynamic-update-slice, custom-call targets kept) and prints total ms +
percentage, the tool used to produce the step-cost splits in docs/PERF.md.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    paths = sorted(glob.glob(os.path.join(root, "plugins", "profile", "*",
                                          "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return paths[-1]


def normalize(name: str) -> str:
    name = name.split("/")[-1]
    m = re.match(r"([a-zA-Z_\-]+)[\.\d]*$", name)
    return m.group(1).rstrip(".-") if m else name


def summarize(path: str, top_k: int = 25):
    data = json.load(gzip.open(path, "rt"))
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]

    # device lanes: process names containing TPU/device; fall back to the
    # lanes that carry XLA op events (args with 'long_name'/'hlo')
    pids_named = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids_named[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pids_named.items()
                   if "TPU" in n or "/device" in n.lower() or "XLA Op" in n}

    buckets = collections.Counter()
    total = 0.0
    for e in events:
        if device_pids and e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        if not device_pids and "long_name" not in args and "hlo_op" not in args:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        buckets[normalize(e.get("name", "?"))] += dur
        total += dur
    if not buckets:
        raise SystemExit("no device op events found — wrong trace or lanes")

    print(f"trace: {path}\ndevice op time total: {total:.1f} ms")
    for name, ms in buckets.most_common(top_k):
        print(f"  {ms:9.2f} ms  {100 * ms / total:5.1f}%  {name}")
    return buckets


if __name__ == "__main__":
    root = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    summarize(find_trace(root), k)

"""Summarize a jax.profiler trace (as written by train.py --profile_dir)
into a device-op time table, optionally bucketed by source file.

Usage:
  python tools/profile_trace.py --trace_dir logs/exp/profile [--steps 20]
      [--hlo path/to/hlo.txt] [--top 40]

The trace dir is searched recursively for *.trace.json.gz (the perfetto
export jax.profiler produces).  With --hlo (a compiled module's as_text()
dump), fusion names are joined to their op_name/source_file metadata so
time can be attributed to framework layers (mlp.py vs encoding.py vs
compositing.py ...).
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_events(trace_dir):
    files = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as fh:
        return json.load(fh).get("traceEvents", [])


def device_aggregate(events):
    pid_name = {e["pid"]: e["args"].get("name", "") for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg, cnt = defaultdict(float), defaultdict(int)
    envelope = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_name.get(e.get("pid"), ""):
            continue
        n = e.get("name", "?")
        if n.startswith("jit_"):
            envelope += e["dur"]
            continue
        if n.isdigit():
            continue
        agg[n] += e["dur"]
        cnt[n] += 1
    return agg, cnt, envelope


def load_hlo_meta(path):
    meta = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?")
    for line in open(path):
        m = pat.search(line)
        if m:
            meta[m.group(1)] = (m.group(2), m.group(3) or "")
    return meta


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", required=True)
    p.add_argument("--steps", type=int, default=1,
                   help="number of steps captured (divides totals)")
    p.add_argument("--hlo", default=None,
                   help="compiled HLO text for source-file attribution")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args(argv)

    events = load_events(args.trace_dir)
    agg, cnt, envelope = device_aggregate(events)
    total = sum(agg.values())
    s = args.steps
    print(f"device op total: {total/1e3/s:.3f} ms/step "
          f"(envelope {envelope/1e3/s:.3f} ms/step, {s} steps)")

    if args.hlo:
        meta = load_hlo_meta(args.hlo)
        by_src = defaultdict(float)
        for n, v in agg.items():
            mm = meta.get(n) or meta.get(re.sub(r"\.\d+$", "", n))
            src = (mm[1].split("/")[-1] if mm and mm[1] else
                   f"<unmatched:{n[:24]}>")
            by_src[src] += v
        print("\nms/step by source file:")
        for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {v/1e3/s:9.3f}  {k}")

    print(f"\ntop {args.top} device ops (ms/step):")
    for n, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v/1e3/s:9.3f} x{cnt[n]//max(s,1):<5} {n[:100]}")
    return total


if __name__ == "__main__":
    main()

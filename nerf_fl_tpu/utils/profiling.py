"""Device-time attribution from a jax.profiler trace.

The tunneled device runtime acks buffers before compute drains, so wall
clock alone cannot distinguish "the program got slower" from "the tunnel
had a bad day" (docs/PERF.md).  The honest per-program metric is device
BUSY time from the trace's own HLO metadata — packaged here so bench.py
can embed `device_step_ms` in its JSON artifact and future rounds can
detect device-time regressions, not just wall regressions.

Why union, not sum: async ops are traced as start/done event PAIRS
(copy-start/copy-done, slice-start/slice-done) whose durations span the
in-flight window and therefore overlap the compute events they hide
behind — summing durations double-counts them (measured: sum 1358 ms vs
union 680 ms on the b1024 device-pool program, exactly 2x).  The
interval union per device lane is the device-occupancy metric; the
per-category sums are kept for RELATIVE attribution only.
"""
import glob
import gzip
import json
from collections import defaultdict


def _union_us(intervals) -> float:
    """Total length of the union of [start, end) intervals (one lane)."""
    if not intervals:
        return 0.0
    intervals.sort()
    total = 0.0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        elif e > cur_e:
            cur_e = e
    return total + (cur_e - cur_s)


def attributed_device_us(trace_dir: str) -> dict:
    """Aggregate device busy time from the newest trace under `trace_dir`.

    Returns {"total_us", "by_category": {cat: us}, "n_ops"} where
    total_us is the sum over device lanes of each lane's interval UNION
    of HLO op events (identified by a `long_name` arg).  Device lanes
    are processes whose name mentions TPU; if none exist (CPU backend
    traces label lanes differently) any lane carrying long_name events
    is counted.  Returns total_us=0 if no trace or no attributable
    events.  by_category holds duration SUMS (async start/done pairs
    overlap compute, so category values are relative weights that can
    together exceed total_us).
    """
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        return {"total_us": 0.0, "by_category": {}, "n_ops": 0}
    with gzip.open(files[-1], "rt") as f:
        ev = json.load(f)["traceEvents"]
    pid_name = {e["pid"]: e["args"].get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_name.items() if "TPU" in n}

    def collect(pid_filter):
        lanes = defaultdict(list)  # (pid, tid) -> [(start, end), ...]
        n = 0
        cat = defaultdict(float)
        for e in ev:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if pid_filter is not None and e.get("pid") not in pid_filter:
                continue
            a = e.get("args") or {}
            if not a.get("long_name"):
                continue  # envelope/step lanes, not HLO ops
            lanes[(e.get("pid"), e.get("tid"))].append(
                (e["ts"], e["ts"] + e["dur"]))
            n += 1
            cat[a.get("hlo_category", "?")] += e["dur"]
        total = sum(_union_us(iv) for iv in lanes.values())
        return total, dict(cat), n

    total, cat, n = collect(tpu_pids if tpu_pids else None)
    return {"total_us": total, "by_category": cat, "n_ops": n}

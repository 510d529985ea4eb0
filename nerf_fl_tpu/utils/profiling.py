"""Device-time attribution from a jax.profiler trace.

The tunneled device runtime acks buffers before compute drains, so wall
clock alone cannot distinguish "the program got slower" from "the tunnel
had a bad day" (docs/PERF.md).  The honest per-program metric is the sum
of device-op durations from the trace's own HLO metadata — the same
aggregation experiments/trace_attr.py prints as a table, packaged here so
bench.py can embed `device_step_ms` in its JSON artifact and future
rounds can detect device-time regressions, not just wall regressions.
"""
import glob
import gzip
import json
from collections import defaultdict


def attributed_device_us(trace_dir: str) -> dict:
    """Aggregate device-op time from the newest trace under `trace_dir`.

    Returns {"total_us", "by_category": {cat: us}, "n_ops"} where
    total_us sums every HLO op event (identified by a `long_name` arg)
    on device lanes.  Device lanes are processes whose name mentions TPU;
    if none exist (CPU backend traces label lanes differently) any
    process that carries long_name-annotated X events is counted.
    Returns total_us=0 if no trace file or no attributable events.
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
        total, n = 0.0, 0
        cat = defaultdict(float)
        for e in ev:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if pid_filter is not None and e.get("pid") not in pid_filter:
                continue
            a = e.get("args") or {}
            if not a.get("long_name"):
                continue  # envelope/step lanes, not HLO ops
            total += e["dur"]
            n += 1
            cat[a.get("hlo_category", "?")] += e["dur"]
        return total, dict(cat), n

    total, cat, n = collect(tpu_pids if tpu_pids else None)
    return {"total_us": total, "by_category": cat, "n_ops": n}

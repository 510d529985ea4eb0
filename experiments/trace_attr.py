"""Attribute device time in a captured jax.profiler trace using the HLO
long_name / bytes_accessed metadata embedded in the perfetto events.

Usage: python experiments/trace_attr.py [trace_dir] [n_steps]
Prints: per-op table (ms/step, achieved GB/s, shape) and category rollup.
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "experiments/trace_b4096"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    f = glob.glob(out + "/**/*.trace.json.gz", recursive=True)[0]
    data = json.load(gzip.open(f, "rt"))
    ev = data["traceEvents"]
    pid_name = {e["pid"]: e["args"].get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}

    rows = defaultdict(lambda: [0.0, 0, 0.0, "", ""])  # dur_us, n, bytes
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_name.get(e.get("pid"), ""):
            continue
        a = e.get("args") or {}
        ln = a.get("long_name")
        if not ln:
            continue  # envelope lanes
        name = e.get("name", "?")
        r = rows[name]
        r[0] += e["dur"]
        r[1] += 1
        r[2] += float(a.get("bytes_accessed", 0))
        r[3] = a.get("hlo_category", "?")
        r[4] = ln

    total = sum(r[0] for r in rows.values())
    print(f"attributed device time: {total/1e3/nsteps:.3f} ms/step "
          f"over {len(rows)} distinct ops")

    cat = defaultdict(float)
    catb = defaultdict(float)
    for r in rows.values():
        cat[r[3]] += r[0]
        catb[r[3]] += r[2]
    print("\n== by hlo_category ==")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        gbs = catb[k] / (v * 1e-6) / 1e9 if v else 0
        print(f"{v/1e3/nsteps:8.3f} ms/step  {gbs:7.1f} GB/s  {k}")

    print("\n== top 60 ops ==")
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1][0])[:60]:
        dur_s = r[0] * 1e-6
        gbs = (r[2] / dur_s / 1e9) if dur_s else 0
        sig = r[4].split(" = ", 1)[1][:120] if " = " in r[4] else r[4][:120]
        print(f"{r[0]/1e3/nsteps:7.3f} ms/step x{r[1]//nsteps:<3} "
              f"{gbs:7.1f} GB/s [{r[3][:14]:14}] {sig}")


if __name__ == "__main__":
    main()

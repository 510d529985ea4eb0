"""Capture a jax.profiler trace of the b4096 train step (XLA path) and print
the device-op time breakdown.

Run: nohup python experiments/trace_step.py > experiments/trace_step.log 2>&1 &
"""
import glob
import gzip
import json
import os
import sys
import types
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import build_params, make_train_step  # noqa: E402
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask  # noqa: E402

OUT = os.environ.get("TRACE_OUT", "experiments/trace_b1024")


def main():
    bs = int(os.environ.get("TRACE_BATCH", 4096))
    rng = np.random.default_rng(0)
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=1.0, noise_std=0.0, compute_dtype="bfloat16",
                       use_pallas=False)
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    h = types.SimpleNamespace(optimizer="adam", lr=5e-4, momentum=0.9,
                              weight_decay=0.0)
    tx = build_optimizer(h)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, donate=False)
    o = rng.normal(0, 1, (bs, 3)).astype(np.float32)
    dd = rng.normal(0, 1, (bs, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    batch = {"rays": jnp.asarray(np.concatenate(
        [o, dd, np.full((bs, 1), 2, np.float32),
         np.full((bs, 1), 6, np.float32)], 1)),
        "ts": jnp.asarray(rng.integers(0, 1500, bs), jnp.int32),
        "rgbs": jnp.asarray(rng.uniform(0, 1, (bs, 3)), jnp.float32)}

    lr, ep = jnp.float32(5e-4), jnp.float32(0.0)
    for i in range(5):
        params, opt_state, m = step(params, opt_state, batch, lr, ep,
                                    jax.random.PRNGKey(i))
    print("warm loss", float(m["train/loss"]), flush=True)

    jax.profiler.start_trace(OUT)
    for i in range(10):
        params, opt_state, m = step(params, opt_state, batch, lr, ep,
                                    jax.random.PRNGKey(100 + i))
    float(m["train/loss"])
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    # ---- parse: aggregate device-op durations from the perfetto json ----
    files = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files, flush=True)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # device lanes: pick pids whose process name mentions TPU/device
        pid_name = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
        agg = defaultdict(float)
        cnt = defaultdict(int)
        total_by_pid = defaultdict(float)
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                pname = pid_name.get(e.get("pid"), "")
                key = (pname, e.get("name", "?"))
                agg[key] += e["dur"]
                cnt[key] += 1
                total_by_pid[pname] += e["dur"]
        print("\n== totals by process ==")
        for p, v in sorted(total_by_pid.items(), key=lambda kv: -kv[1]):
            print(f"{v/1e3:10.2f} ms  {p}")
        print("\n== top 40 ops ==")
        for (p, name), v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{v/1e3:9.2f} ms  x{cnt[(p, name)]:<5} [{p[:30]}] "
                  f"{name[:110]}")


if __name__ == "__main__":
    main()

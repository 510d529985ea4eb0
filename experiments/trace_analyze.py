"""Aggregate device ops from the captured trace + dump compiled HLO to map
fusion names to their content."""
import glob
import gzip
import json
import os
import sys
import types
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

OUT = "experiments/trace_b4096"


def device_table():
    f = glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                  recursive=True)[0]
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pid_name.get(e.get("pid"), ""):
            continue
        name = e.get("name", "?")
        if name.startswith("jit_step") or name.isdigit():
            continue  # envelope / step lanes
        agg[name] += e["dur"]
        cnt[name] += 1
    total = sum(agg.values())
    print(f"device op total: {total/1e3:.2f} ms over 10 steps "
          f"({total/1e4:.3f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, v in rows:
        if v < 500:  # < 0.05 ms/step
            continue
        print(f"{v/1e4:8.3f} ms/step x{cnt[name]//10:<4} {name[:90]}")
    return [name for name, v in rows[:25]]


def dump_hlo():
    import jax
    import jax.numpy as jnp
    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training.system import build_params, make_train_step
    from nerf_fl_tpu.training.optimizers import (build_optimizer,
                                                 make_trainable_mask)
    bs = 4096
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
    lowered = jax.jit(step).lower(params, opt_state, batch, jnp.float32(5e-4),
                                  jnp.float32(0.0), jax.random.PRNGKey(0))
    # optimized HLO without a device compile: use the XLA pipeline via
    # compiler backend? compile() would trigger the slow remote compile; the
    # trace's fusions come from the optimized module, so we need compile().
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("experiments/step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO dumped:", len(txt), "chars")


if __name__ == "__main__":
    hot = device_table()
    if os.environ.get("DUMP_HLO", "1") == "1":
        dump_hlo()
        txt = open("experiments/step_hlo.txt").read()
        import re
        for name in hot:
            base = name.split("(")[0].strip()
            m = re.search(rf"^\s*%?{re.escape(base)}\.?\w* = .*$", txt,
                          re.M)
            if m:
                print(f"\n--- {base} ---")
                print(m.group(0)[:400])

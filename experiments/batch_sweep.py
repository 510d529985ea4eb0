"""Batch-size sweep of the honest train-step benchmark (one process).

Measures rays/s at several batch sizes with the same harness as bench.py
(DevicePrefetcher feed, scalar-readback sync, median of 3 windows).
Run: nohup python experiments/batch_sweep.py > experiments/batch_sweep.log 2>&1 &
"""
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_fl_tpu.render import RenderConfig
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask
from nerf_fl_tpu.training.system import (DevicePrefetcher, build_params,
                                         make_train_step)

BATCHES = [int(b) for b in os.environ.get("SWEEP_BATCHES",
                                          "1024,2048,4096").split(",")]
STEPS = int(os.environ.get("SWEEP_STEPS", 120))

cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                   encode_t=True, beta_min=0.1, white_back=True,
                   perturb=1.0, noise_std=0.0, compute_dtype="bfloat16")

rng = np.random.default_rng(0)
n_pool = 1 << 20
o = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
d = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
pool_rays = np.concatenate([o, d, np.full((n_pool, 1), 2, np.float32),
                            np.full((n_pool, 1), 6, np.float32)], 1)
pool_ts = rng.integers(0, 1500, n_pool).astype(np.int32)
pool_rgb = rng.uniform(0, 1, (n_pool, 3)).astype(np.float32)

results = []
for bs in BATCHES:
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    h = types.SimpleNamespace(optimizer="adam", lr=5e-4, momentum=0.9,
                              weight_decay=0.0)
    tx = build_optimizer(h)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, donate=True)

    def get_batch(i, bs=bs):
        idx = rng.integers(0, n_pool, bs)
        return {"rays": jnp.asarray(pool_rays[idx]),
                "ts": jnp.asarray(pool_ts[idx]),
                "rgbs": jnp.asarray(pool_rgb[idx])}

    lr = jnp.float32(5e-4)
    ep = jnp.float32(0.0)
    key = jax.random.PRNGKey(1)

    for attempt in range(3):
        try:
            for i in range(5):
                params, opt_state, m = step(params, opt_state, get_batch(i),
                                            lr, ep, jax.random.fold_in(key, i))
            float(m["train/loss"])
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[b{bs}] warmup attempt {attempt} failed ({e}); retrying",
                  flush=True)
            time.sleep(20)

    rates = []
    for w in range(3):
        stream = DevicePrefetcher(
            iter(range(100 + w * STEPS, 100 + (w + 1) * STEPS)),
            lambda i: (get_batch(i), jax.random.fold_in(key, i)), depth=4)
        t0 = time.perf_counter()
        for batch, k in stream:
            params, opt_state, m = step(params, opt_state, batch, lr, ep, k)
        float(m["train/loss"])
        dt = time.perf_counter() - t0
        rates.append(STEPS * bs / dt)
    med = sorted(rates)[1]
    rec = {"batch": bs, "rays_per_sec": round(med, 1),
           "ms_per_step": round(1000.0 * bs / med, 2),
           "windows": [round(r, 1) for r in rates]}
    print(json.dumps(rec), flush=True)
    results.append(rec)
    del params, opt_state, step

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "batch_sweep_results.json"), "w") as f:
    json.dump(results, f, indent=1)
print("done", flush=True)

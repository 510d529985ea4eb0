"""Benchmark harness: training rays/sec/chip on the reference recipe.

Workload = the README headline training config (reference README.md:53-77):
full NeRF-W (coarse+fine, appearance + transient embeddings), N_samples 64,
N_importance 64, batch 1024 — the shape trained on lego 400^2.  The number
reported is end-to-end train-step throughput including host batch gather,
loss, backward and the Adam update.

Baseline: the reference publishes NO throughput numbers (SURVEY.md section 6),
so vs_baseline is computed against a documented estimate of the reference's
training speed on its own hardware (1x RTX 2080 Ti): ~6000 rays/s — from
nerf_pl-family NeRF-W training at batch 1024 running ~5-6 it/s.  The driver
target is >= 5x that on one v5e chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_2080TI = 6000.0  # documented estimate, see docstring


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training.optimizers import (build_optimizer,
                                                 make_trainable_mask)
    from nerf_fl_tpu.training.system import build_params, make_train_step
    import types

    batch_size = int(os.environ.get("BENCH_BATCH", 1024))
    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    measure_steps = int(os.environ.get("BENCH_STEPS", 100))

    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=1.0, noise_std=0.0,
                       compute_dtype=compute_dtype)
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    h = types.SimpleNamespace(optimizer="adam", lr=5e-4, momentum=0.9,
                              weight_decay=0.0)
    tx = build_optimizer(h)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, donate=True)

    # synthetic ray pool (data feed is a host gather, same as real training)
    rng = np.random.default_rng(0)
    n_pool = 1 << 20
    o = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pool_rays = np.concatenate(
        [o, d, np.full((n_pool, 1), 2, np.float32),
         np.full((n_pool, 1), 6, np.float32)], 1)
    pool_ts = rng.integers(0, 1500, n_pool).astype(np.int32)
    pool_rgb = rng.uniform(0, 1, (n_pool, 3)).astype(np.float32)

    def get_batch(i):
        idx = rng.integers(0, n_pool, batch_size)
        return {"rays": jnp.asarray(pool_rays[idx]),
                "ts": jnp.asarray(pool_ts[idx]),
                "rgbs": jnp.asarray(pool_rgb[idx])}

    lr = jnp.float32(5e-4)
    ep = jnp.float32(0.0)
    key = jax.random.PRNGKey(1)

    # warmup / compile.  NOTE: a scalar readback (float(...)) is the sync
    # point, not block_until_ready — the tunneled device runtime used in
    # this environment acks buffers before compute drains, so only a real
    # device->host value transfer bounds the measured region honestly.
    # The remote compile service occasionally 500s transiently: retry.
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
            print(f"warmup attempt {attempt} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(20)

    # three measurement windows; report the median (tunnel-induced stalls
    # occasionally dent a single window by ~20%)
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(measure_steps):
            params, opt_state, m = step(
                params, opt_state, get_batch(i), lr, ep,
                jax.random.fold_in(key, 100 + w * measure_steps + i))
        float(m["train/loss"])  # depends on the full step chain via donation
        dt = time.perf_counter() - t0
        rates.append(measure_steps * batch_size / dt)

    rays_per_sec = sorted(rates)[1]
    result = {
        "metric": "train_rays_per_sec_nerfw_64+64_b1024",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_2080TI, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Measure the bench train step (NeRF-W 64+64 b1024 bf16, donate=True) under
the XLA_FLAGS the launching shell set.  Appends one JSON line to
experiments/xla_flag_results.jsonl.

Run via experiments/xla_flag_runner.sh (one process per flag set — XLA_FLAGS
is read once at backend init).
"""
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from nerf_fl_tpu.render import RenderConfig
    from nerf_fl_tpu.training.optimizers import (build_optimizer,
                                                 make_trainable_mask)
    from nerf_fl_tpu.training.system import build_params, make_train_step

    label = os.environ.get("PROBE_LABEL", "baseline")
    bs = int(os.environ.get("PROBE_BATCH", 1024))

    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=1.0, noise_std=0.0, compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    h = types.SimpleNamespace(optimizer="adam", lr=5e-4, momentum=0.9,
                              weight_decay=0.0)
    tx = build_optimizer(h)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, donate=True)

    rng = np.random.default_rng(0)
    o = rng.normal(0, 1, (bs, 3)).astype(np.float32)
    d = rng.normal(0, 1, (bs, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"rays": jnp.asarray(np.concatenate(
        [o, d, np.full((bs, 1), 2, np.float32),
         np.full((bs, 1), 6, np.float32)], 1)),
        "ts": jnp.asarray(rng.integers(0, 1500, bs), jnp.int32),
        "rgbs": jnp.asarray(rng.uniform(0, 1, (bs, 3)), jnp.float32)}
    lr, ep = jnp.float32(5e-4), jnp.float32(0.0)
    key = jax.random.PRNGKey(1)

    for i in range(5):
        params, opt_state, m = step(params, opt_state, batch, lr, ep,
                                    jax.random.fold_in(key, i))
    float(m["train/loss"])

    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(30):
            params, opt_state, m = step(params, opt_state, batch, lr, ep,
                                        jax.random.fold_in(key, 100 + i))
        float(m["train/loss"])
        times.append((time.perf_counter() - t0) / 30)
    ms = sorted(times)[1] * 1e3
    rec = {"label": label, "batch": bs, "ms_per_step": round(ms, 3),
           "rays_per_sec": round(bs / (ms / 1e3), 1),
           "xla_flags": os.environ.get("LIBTPU_INIT_ARGS", "")
           + " | " + os.environ.get("XLA_FLAGS", "")}
    print(json.dumps(rec), flush=True)
    with open("experiments/xla_flag_results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

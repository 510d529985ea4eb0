"""A/B: threefry vs rbg PRNG inside the train step (device time).

The per-step random draws (stratified-depth jitter + sample_pdf uniforms,
~131k values at 64+64/b1024) lower to threefry2x32 loop fusions on the VPU.
jax's 'rbg' implementation generates the same-shaped bits ~an order of
magnitude cheaper.  Keys carry their impl, so this runs both in one
process; streams differ (both are valid IID samplers).

Run: nohup python experiments/r3/prng_ab.py > experiments/r3/prng_ab.log 2>&1 &
"""
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_fl_tpu.utils.compile_cache import enable_compile_cache  # noqa
enable_compile_cache()

from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.optimizers import (build_optimizer,  # noqa: E402
                                             make_trainable_mask)
from nerf_fl_tpu.training.system import (build_params,  # noqa: E402
                                         epoch_perm,
                                         make_device_pool_step)

B = int(os.environ.get("AB_BATCH", 1024))
K = int(os.environ.get("AB_SPE", 32))
STEPS = 192 if B == 1024 else 64


def measure(impl):
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=1.0, noise_std=0.0, compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    tx = build_optimizer(types.SimpleNamespace(
        optimizer="adam", lr=5e-4, momentum=0.9, weight_decay=0.0))
    opt_state = tx.init(params)
    step = make_device_pool_step(cfg, tx, mask, batch_size=B, donate=True,
                                 steps_per_execution=K)

    rng = np.random.default_rng(0)
    n_pool = 1 << 20
    o = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pool = {"rays": jnp.asarray(np.concatenate(
                [o, d, np.full((n_pool, 1), 2, np.float32),
                 np.full((n_pool, 1), 6, np.float32)], 1)),
            "ts": jnp.asarray(rng.integers(0, 1500, n_pool), jnp.int32),
            "rgbs": jnp.asarray(rng.uniform(0, 1, (n_pool, 3)), jnp.float32)}
    perm = jnp.asarray(epoch_perm(2, 0, n_pool, n_pool))
    base = jax.random.key(1, impl=impl)  # typed key: carries its impl
    lr, ep, big = jnp.float32(5e-4), jnp.float32(0.0), jnp.int32(10 ** 9)

    def window(params, opt_state, w):
        t0 = time.perf_counter()
        for g in range(0, STEPS, K):
            params, opt_state, m = step(params, opt_state, pool, perm,
                                        jnp.int32(g),
                                        jnp.uint32(w * STEPS + g),
                                        big, lr, ep, base)
        float(np.asarray(m["train/loss"]).reshape(-1)[-1])
        return params, opt_state, (time.perf_counter() - t0) / STEPS * 1e3

    params, opt_state, _ = window(params, opt_state, 0)  # compile+warm
    times = []
    for w in range(1, 4):
        params, opt_state, ms = window(params, opt_state, w)
        times.append(ms)
        print(f"impl={impl} window {w}: {ms:.3f} ms/step "
              f"({B / ms * 1e3:,.0f} rays/s)", flush=True)
    med = sorted(times)[1]
    print(f"impl={impl} MEDIAN {med:.3f} ms/step ({B/med*1e3:,.0f} rays/s)",
          flush=True)
    return med


if __name__ == "__main__":
    t = measure("threefry2x32")
    r = measure("rbg")
    print(f"\nthreefry {t:.3f} ms/step vs rbg {r:.3f} ms/step "
          f"(delta {t - r:+.3f} ms)", flush=True)

"""Trace the device-pool K-step program: how much device time does the
on-device batch gather add over the host-fed step's 10.51 ms?

Run: nohup python experiments/r3/trace_pool.py > experiments/r3/trace_pool.log 2>&1 &
"""
import os
import sys
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

OUT = os.environ.get("TRACE_OUT", "experiments/r3/trace_pool")
B, K = 1024, 8  # K=8: trace windows divide evenly; per-step cost is what matters


def main():
    cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                       encode_t=True, beta_min=0.1, white_back=True,
                       perturb=1.0, noise_std=0.0, compute_dtype="bfloat16")
    params = build_params(jax.random.PRNGKey(0), cfg, 1500)
    mask = make_trainable_mask(params, refine_pose=False)
    tx = build_optimizer(types.SimpleNamespace(
        optimizer="adam", lr=5e-4, momentum=0.9, weight_decay=0.0))
    opt_state = tx.init(params)
    step = make_device_pool_step(cfg, tx, mask, batch_size=B, donate=False,
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
    base = jax.random.PRNGKey(1)
    lr, ep, big = jnp.float32(5e-4), jnp.float32(0.0), jnp.int32(10 ** 9)

    for i in range(2):
        params, opt_state, m = step(params, opt_state, pool, perm,
                                    jnp.int32(i * K), jnp.uint32(i * K),
                                    big, lr, ep, base)
    print("warm loss", float(np.asarray(m["train/loss"])[-1]), flush=True)

    jax.profiler.start_trace(OUT)
    for i in range(2, 7):  # 5 dispatches x K=8 -> 40 steps traced
        params, opt_state, m = step(params, opt_state, pool, perm,
                                    jnp.int32(i * K), jnp.uint32(i * K),
                                    big, lr, ep, base)
    float(np.asarray(m["train/loss"])[-1])
    jax.profiler.stop_trace()
    print("trace written", flush=True)


if __name__ == "__main__":
    main()

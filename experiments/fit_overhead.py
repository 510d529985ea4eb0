"""Attribute the fit()-loop overhead vs bench's bare step loop.

Run: nohup python experiments/fit_overhead.py > experiments/fit_overhead.log 2>&1 &
"""
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import build_params, make_train_step  # noqa: E402
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask  # noqa: E402
from nerf_fl_tpu.parallel import make_mesh, shard_batch, place_params  # noqa: E402
from nerf_fl_tpu.data.sampler import RayBatcher  # noqa: E402


def main():
    bs = 1024
    rng = np.random.default_rng(0)
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
    mesh = make_mesh(num_data=1)
    params = place_params(mesh, params)
    opt_state = tx.init(params)

    n_pool = 1 << 21
    o = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n_pool, 1), 2, np.float32),
                           np.full((n_pool, 1), 6, np.float32)], 1)
    ts = rng.integers(0, 1500, n_pool).astype(np.int32)
    rgb = rng.uniform(0, 1, (n_pool, 3)).astype(np.float32)
    batcher = RayBatcher(rays, ts, rgb, bs, seed=0)

    lr = jnp.float32(5e-4)
    ep = jnp.float32(0.0)
    key = jax.random.PRNGKey(1)

    def run(name, get_batch, use_fold, k=200):
        nonlocal params, opt_state
        m = None
        for i in range(5):
            r = jax.random.fold_in(key, i) if use_fold else key
            params, opt_state, m = step(params, opt_state, get_batch(i),
                                        lr, ep, r)
        float(m["train/loss"])
        t0 = time.perf_counter()
        for i in range(k):
            r = jax.random.fold_in(key, 100 + i) if use_fold else key
            params, opt_state, m = step(params, opt_state, get_batch(i),
                                        lr, ep, r)
        float(m["train/loss"])
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.3f} ms/step ({bs/dt:,.0f} rays/s)",
              flush=True)

    # (a) bench style: host slice + jnp.asarray, fixed key
    def bench_batch(i):
        idx = rng.integers(0, n_pool, bs)
        return {"rays": jnp.asarray(rays[idx]), "ts": jnp.asarray(ts[idx]),
                "rgbs": jnp.asarray(rgb[idx])}
    run("a_bench_style", bench_batch, use_fold=False)

    # (b) + fold_in per step
    run("b_plus_fold_in", bench_batch, use_fold=True)

    # (c) + shard_batch (device_put with sharding) as fit() does
    def shard_style(i):
        idx = rng.integers(0, n_pool, bs)
        return shard_batch(mesh, {"rays": rays[idx], "ts": ts[idx],
                                  "rgbs": rgb[idx]})
    run("c_shard_batch", shard_style, use_fold=True)

    # (d) full fit-style: RayBatcher epoch generator + shard_batch + fold_in
    gen = iter(batcher.epoch(0))

    def batcher_style(i):
        nonlocal gen
        try:
            b = next(gen)
        except StopIteration:
            gen = iter(batcher.epoch(1))
            b = next(gen)
        return shard_batch(mesh, b)
    run("d_fit_style", batcher_style, use_fold=True)


if __name__ == "__main__":
    main()

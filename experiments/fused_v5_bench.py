"""v2+fast-sin kernel vs XLA, plus end-to-end train step with use_pallas on.

Run: nohup python experiments/fused_v5_bench.py > experiments/fused_v3.log 2>&1 &
"""
import json
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import nerf_fl_tpu.ops.fused_mlp as fm  # noqa: E402
from nerf_fl_tpu.models.mlp import NeRFConfig, init_nerf  # noqa: E402
from nerf_fl_tpu.render import RenderConfig  # noqa: E402
from nerf_fl_tpu.training.system import build_params, make_train_step  # noqa: E402
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask  # noqa: E402

RESULTS = {}


def bench(name, f, *args, k=30):
    for attempt in range(3):
        try:
            float(f(*args))
            break
        except Exception as e:
            print(f"[{name}] attempt {attempt}: {type(e).__name__} {e}",
                  flush=True)
            if attempt == 2:
                RESULTS[name] = None
                return
            time.sleep(20)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*args)
        float(r)
        ts.append((time.perf_counter() - t0) / k)
    ms = sorted(ts)[1] * 1e3
    RESULTS[name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms", flush=True)
    with open("experiments/fused_v5_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def main():
    rng = np.random.default_rng(0)
    fcfg = NeRFConfig(typ="fine", encode_appearance=True, in_channels_a=48,
                      encode_transient=True)
    mp = init_nerf(jax.random.PRNGKey(0), fcfg)

    def fused_scalar(p, xyz, d, a, t):
        o = fm.fused_apply_nerf(p, xyz, d, a, t, output_transient=True,
                                compute_dtype=jnp.bfloat16)
        return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                jnp.sum(o["transient_rgb"]) + jnp.sum(o["transient_sigma"]) +
                jnp.sum(o["transient_beta"]))

    def fused_loss(p, xyz, d, a, t):
        l, g = jax.value_and_grad(fused_scalar)(p, xyz, d, a, t)
        return l + jnp.sum(g["xyz"][0]["w"])

    for N in (524288, 131072):
        xyz = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        a = jnp.asarray(rng.normal(0, 1, (N, 48)), jnp.float32)
        t = jnp.asarray(rng.normal(0, 1, (N, 16)), jnp.float32)
        bench(f"v5_fwd_N{N}", jax.jit(fused_scalar), mp, xyz, d, a, t)
        bench(f"v5_fwdbwd_N{N}", jax.jit(fused_loss), mp, xyz, d, a, t, k=20)

    # end-to-end train step, pallas on vs off
    for bs in (1024, 4096):
        for pallas in (True, False):
            cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                               encode_t=True, beta_min=0.1, white_back=True,
                               perturb=1.0, noise_std=0.0,
                               compute_dtype="bfloat16", use_pallas=pallas)
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
            batch = {
                "rays": jnp.asarray(np.concatenate(
                    [o, dd, np.full((bs, 1), 2, np.float32),
                     np.full((bs, 1), 6, np.float32)], 1)),
                "ts": jnp.asarray(rng.integers(0, 1500, bs), jnp.int32),
                "rgbs": jnp.asarray(rng.uniform(0, 1, (bs, 3)), jnp.float32)}

            def stepper(params, opt_state, batch):
                p, s, m = step(params, opt_state, batch, jnp.float32(5e-4),
                               jnp.float32(0.0), jax.random.PRNGKey(7))
                return m["train/loss"]
            tag = "pallas" if pallas else "xla"
            bench(f"train_step_b{bs}_{tag}", stepper, params, opt_state,
                  batch, k=20)
            r = RESULTS.get(f"train_step_b{bs}_{tag}")
            if r:
                print(f"  -> {bs / (r / 1e3):,.0f} rays/s", flush=True)

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()

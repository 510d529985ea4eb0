"""Component-level perf attribution on the real TPU chip (honest readback
sync).  Produces the 'before' table for docs/PERF.md.

Run: nohup python experiments/perf_probe.py > experiments/perf_probe.log 2>&1 &
"""
import functools
import json
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from nerf_fl_tpu.render import RenderConfig, render_rays  # noqa: E402
from nerf_fl_tpu.models.mlp import NeRFConfig, apply_nerf, init_nerf  # noqa: E402
from nerf_fl_tpu.ops.fused_mlp import fused_apply_nerf  # noqa: E402
from nerf_fl_tpu.core import encoding  # noqa: E402
from nerf_fl_tpu.training.system import build_params, make_train_step  # noqa: E402
from nerf_fl_tpu.training.optimizers import build_optimizer, make_trainable_mask  # noqa: E402

RESULTS = {}


def bench(name, f, *args, k=30, retries=3):
    """Time f(*args) which must return a scalar; honest sync = float readback."""
    for attempt in range(retries):
        try:
            float(f(*args))  # compile + warm
            break
        except Exception as e:
            print(f"[{name}] warmup attempt {attempt}: {e}", flush=True)
            if attempt == retries - 1:
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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- fine-pass MLP shapes: b1024 -> N=131072, b4096 -> N=524288 ----
    fcfg = NeRFConfig(typ="fine", encode_appearance=True, in_channels_a=48,
                      encode_transient=True)
    mp = init_nerf(key, fcfg)
    for N in (131072, 524288):
        x = jnp.asarray(rng.normal(0, 1, (N, 63)), jnp.float32)
        d = jnp.asarray(rng.normal(0, 1, (N, 75)), jnp.float32)
        t = jnp.asarray(rng.normal(0, 1, (N, 16)), jnp.float32)

        @jax.jit
        def xla_fwd(p, x, d, t):
            o = apply_nerf(p, fcfg, x, d, t, output_transient=True,
                           compute_dtype=jnp.bfloat16)
            return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                    jnp.sum(o["transient_rgb"]) + jnp.sum(o["transient_sigma"]) +
                    jnp.sum(o["transient_beta"]))
        bench(f"xla_mlp_fwd_N{N}", xla_fwd, mp, x, d, t)

        @jax.jit
        def xla_fwdbwd(p, x, d, t):
            def lf(p):
                o = apply_nerf(p, fcfg, x, d, t, output_transient=True,
                               compute_dtype=jnp.bfloat16)
                return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                        jnp.sum(o["transient_rgb"]) +
                        jnp.sum(o["transient_sigma"]) +
                        jnp.sum(o["transient_beta"]))
            l, g = jax.value_and_grad(lf)(p)
            return l + jnp.sum(g["xyz"][0]["w"])
        bench(f"xla_mlp_fwdbwd_N{N}", xla_fwdbwd, mp, x, d, t)

        @jax.jit
        def pallas_fwd(p, x, d, t):
            o = fused_apply_nerf(p, x, d, t, output_transient=True,
                                 compute_dtype=jnp.bfloat16)
            return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                    jnp.sum(o["transient_rgb"]) + jnp.sum(o["transient_sigma"]) +
                    jnp.sum(o["transient_beta"]))
        bench(f"pallas_mlp_fwd_N{N}", pallas_fwd, mp, x, d, t)

        @jax.jit
        def pallas_fwdbwd(p, x, d, t):
            def lf(p):
                o = fused_apply_nerf(p, x, d, t, output_transient=True,
                                     compute_dtype=jnp.bfloat16)
                return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                        jnp.sum(o["transient_rgb"]) +
                        jnp.sum(o["transient_sigma"]) +
                        jnp.sum(o["transient_beta"]))
            l, g = jax.value_and_grad(lf)(p)
            return l + jnp.sum(g["xyz"][0]["w"])
        bench(f"pallas_mlp_fwdbwd_N{N}", pallas_fwdbwd, mp, x, d, t)

        # PE cost alone (xyz, 10 freqs)
        xyz = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)

        @jax.jit
        def pe(xyz):
            return jnp.sum(encoding.embed(xyz, 10))
        bench(f"xla_pe_xyz_N{N}", pe, xyz)

    # ---- full train step, b1024 and b4096 ----
    for bs in (1024, 4096):
        cfg = RenderConfig(N_samples=64, N_importance=64, encode_a=True,
                           encode_t=True, beta_min=0.1, white_back=True,
                           perturb=1.0, noise_std=0.0,
                           compute_dtype="bfloat16")
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
        rays = jnp.asarray(np.concatenate(
            [o, dd, np.full((bs, 1), 2, np.float32),
             np.full((bs, 1), 6, np.float32)], 1))
        batch = {"rays": rays,
                 "ts": jnp.asarray(rng.integers(0, 1500, bs), jnp.int32),
                 "rgbs": jnp.asarray(rng.uniform(0, 1, (bs, 3)), jnp.float32)}

        def stepper(params, opt_state, batch):
            p, s, m = step(params, opt_state, batch, jnp.float32(5e-4),
                           jnp.float32(0.0), jax.random.PRNGKey(7))
            return m["train/loss"]
        bench(f"train_step_b{bs}", stepper, params, opt_state, batch, k=20)

        # forward+loss only (no grad) — isolates bwd share
        from nerf_fl_tpu.training.losses import loss_dict

        @jax.jit
        def fwd_loss(params, batch):
            res = render_rays(params, batch["rays"], batch["ts"],
                              jax.random.PRNGKey(7), cfg, epoch=0.0)
            ld = loss_dict["nerfw"](res, batch["rgbs"])
            return sum(ld.values())
        bench(f"fwd_loss_b{bs}", fwd_loss, params, batch, k=20)

    print(json.dumps(RESULTS, indent=1), flush=True)
    with open("experiments/perf_probe_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()

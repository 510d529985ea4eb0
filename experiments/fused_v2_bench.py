"""Fused-kernel v2 tile sweep + head-to-head vs XLA, from RAW inputs (fair:
both sides pay packing/PE).  Honest readback sync.

Run: nohup python experiments/fused_v2_bench.py > experiments/fused_v2.log 2>&1 &
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import nerf_fl_tpu.ops.fused_mlp as fm  # noqa: E402
from nerf_fl_tpu.core import encoding  # noqa: E402
from nerf_fl_tpu.models.mlp import NeRFConfig, apply_nerf, init_nerf  # noqa: E402

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
                return None
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
    with open("experiments/fused_v2_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return ms


def clear_kernel_caches():
    fm._fused_fwd.clear_cache()
    fm._fused_bwd.clear_cache()


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    fcfg = NeRFConfig(typ="fine", encode_appearance=True, in_channels_a=48,
                      encode_transient=True)
    mp = init_nerf(key, fcfg)

    def raw(N):
        xyz = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        a = jnp.asarray(rng.normal(0, 1, (N, 48)), jnp.float32)
        t = jnp.asarray(rng.normal(0, 1, (N, 16)), jnp.float32)
        return xyz, d, a, t

    def fused_scalar(p, xyz, d, a, t):
        o = fm.fused_apply_nerf(p, xyz, d, a, t, output_transient=True,
                                compute_dtype=jnp.bfloat16)
        return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                jnp.sum(o["transient_rgb"]) + jnp.sum(o["transient_sigma"]) +
                jnp.sum(o["transient_beta"]))

    def fused_loss(p, xyz, d, a, t):
        l, g = jax.value_and_grad(fused_scalar)(p, xyz, d, a, t)
        return l + jnp.sum(g["xyz"][0]["w"])

    N = 524288
    args = raw(N)

    # --- fwd tile sweep ---
    for tf in (1024, 2048, 4096):
        fm.TILE_FWD = tf
        fm.TILE = 1024
        clear_kernel_caches()
        f = jax.jit(fused_scalar)
        bench(f"v2_fwd_N{N}_tile{tf}", f, mp, *args)

    best_tf = min((t for t in (1024, 2048, 4096)
                   if RESULTS.get(f"v2_fwd_N{N}_tile{t}")),
                  key=lambda t: RESULTS[f"v2_fwd_N{N}_tile{t}"])
    print("best fwd tile:", best_tf, flush=True)

    # --- bwd tile sweep (fwd fixed at best) ---
    for tb in (512, 1024, 2048):
        fm.TILE_FWD = best_tf
        fm.TILE = tb
        clear_kernel_caches()
        f = jax.jit(fused_loss)
        bench(f"v2_fwdbwd_N{N}_btile{tb}", f, mp, *args, k=20)

    best_tb = min((t for t in (512, 1024, 2048)
                   if RESULTS.get(f"v2_fwdbwd_N{N}_btile{t}")),
                  key=lambda t: RESULTS[f"v2_fwdbwd_N{N}_btile{t}"])
    print("best bwd tile:", best_tb, flush=True)

    # --- XLA baseline from the same RAW inputs (embed inside) ---
    def xla_scalar(p, xyz, d, a, t):
        xe = encoding.posenc(xyz, 10)
        de = jnp.concatenate([encoding.posenc(d, 4), a], -1)
        o = apply_nerf(p, fcfg, xe, de, t, output_transient=True,
                       compute_dtype=jnp.bfloat16)
        return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"]) +
                jnp.sum(o["transient_rgb"]) + jnp.sum(o["transient_sigma"]) +
                jnp.sum(o["transient_beta"]))

    def xla_loss(p, xyz, d, a, t):
        l, g = jax.value_and_grad(xla_scalar)(p, xyz, d, a, t)
        return l + jnp.sum(g["xyz"][0]["w"])

    fm.TILE_FWD, fm.TILE = best_tf, best_tb
    clear_kernel_caches()
    for N2 in (131072, 524288):
        args2 = raw(N2)
        bench(f"xla_raw_fwd_N{N2}", jax.jit(xla_scalar), mp, *args2)
        bench(f"xla_raw_fwdbwd_N{N2}", jax.jit(xla_loss), mp, *args2, k=20)
        if N2 != N:
            bench(f"v2_fwd_N{N2}_tile{best_tf}", jax.jit(fused_scalar),
                  mp, *args2)
            bench(f"v2_fwdbwd_N{N2}_btile{best_tb}", jax.jit(fused_loss),
                  mp, *args2, k=20)

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()

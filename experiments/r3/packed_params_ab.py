"""Packed-params experiment (VERDICT r2 item 3): does removing the per-call
weight pack/unpack flip the Pallas fused kernel past XLA?

Measures, at the fine-pass shapes (N=524k b4096-scale / N=131k b1024-scale),
bf16:
  * xla_fwd / xla_fwdbwd      — the bar: embed+MLP via models.mlp (XLA)
  * pallas_wrapped_fwd[...bwd]— current path: pack_weights INSIDE the jit
  * pallas_packed_fwd[...bwd] — weights PRE-packed once outside the timed
                                region (the 'packed-params train state'
                                proposal, docs/PERF.md:183-188)
  * pack_only                 — the pack_weights cost itself

Run: nohup python experiments/r3/packed_params_ab.py > experiments/r3/packed_params_ab.log 2>&1 &
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_fl_tpu.utils.compile_cache import enable_compile_cache  # noqa
enable_compile_cache()

import nerf_fl_tpu.ops.fused_mlp as fm  # noqa: E402
from nerf_fl_tpu.core.encoding import posenc  # noqa: E402
from nerf_fl_tpu.models.mlp import NeRFConfig, apply_nerf, init_nerf  # noqa

RESULTS = {}


def bench(name, f, *args, k=20):
    try:
        jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape(-1)[0], f(*args))
    except Exception as e:
        print(f"[{name}] failed: {type(e).__name__} {e}", flush=True)
        RESULTS[name] = None
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).reshape(-1)[0], r)
        ts.append((time.perf_counter() - t0) / k)
    ms = sorted(ts)[1] * 1e3
    RESULTS[name] = round(ms, 3)
    print(f"{name}: {ms:.3f} ms", flush=True)
    with open("experiments/r3/packed_params_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    return ms


def main():
    rng = np.random.default_rng(0)
    fcfg = NeRFConfig(typ="fine", encode_appearance=True, in_channels_a=48,
                      encode_transient=True)
    mp = init_nerf(jax.random.PRNGKey(0), fcfg)
    a_dim, has_t, dtype_name = 48, True, "bfloat16"
    meta_kw = dict(a_dim=a_dim, has_transient=has_t, dtype_name=dtype_name,
                   interpret=False, n_freq_xyz=10, n_freq_dir=4)

    # the packed-params state: weights packed ONCE, outside every timed call
    ws = [jnp.asarray(w) for w in fm.pack_weights(
        mp, a_dim, has_t, jnp.bfloat16)]
    sx, sd = fm.default_scale_rows(10, 4, a_dim, None, None)

    def xla_apply(p, xyz, d, a, t):
        xe = posenc(xyz, 10, fast=True).astype(jnp.bfloat16)
        de = posenc(d, 4, fast=True).astype(jnp.bfloat16)
        da = jnp.concatenate([de, a.astype(jnp.bfloat16)], axis=-1)
        o = apply_nerf(p, fcfg, xe, da, t.astype(jnp.bfloat16),
                       output_transient=True, compute_dtype=jnp.bfloat16)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in o.values())

    def xla_loss(p, xyz, d, a, t):
        l, g = jax.value_and_grad(xla_apply)(p, xyz, d, a, t)
        return l + jnp.sum(g["xyz"][0]["w"])

    # the PRODUCTION XLA path: per-RAY dir/a/t conditioning contracted per
    # ray inside apply_nerf (round-2 matmul-split, _dense_ray_cond) — the
    # honest bar; the per-point variant above matches the kernel's input
    # semantics instead
    S = 128

    def xla_rayc(p, xyz, d_ray, a_ray, t_ray):
        xe = posenc(xyz, 10, fast=True).astype(jnp.bfloat16)
        de = posenc(d_ray, 4, fast=True).astype(jnp.bfloat16)
        da = jnp.concatenate([de, a_ray.astype(jnp.bfloat16)], axis=-1)
        o = apply_nerf(p, fcfg, xe, da, t_ray.astype(jnp.bfloat16),
                       output_transient=True, compute_dtype=jnp.bfloat16,
                       samples_per_ray=S)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in o.values())

    def xla_rayc_loss(p, xyz, d_ray, a_ray, t_ray):
        l, g = jax.value_and_grad(xla_rayc)(p, xyz, d_ray, a_ray, t_ray)
        return l + jnp.sum(g["xyz"][0]["w"])

    def wrapped_fwd(p, xyz, d, a, t):
        o = fm.fused_apply_nerf(p, xyz, d, a, t, output_transient=True,
                                compute_dtype=jnp.bfloat16)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in o.values())

    def wrapped_loss(p, xyz, d, a, t):
        l, g = jax.value_and_grad(wrapped_fwd)(p, xyz, d, a, t)
        return l + jnp.sum(g["xyz"][0]["w"])

    def pack_input(xyz, d, a, t):
        inp = jnp.concatenate([xyz, d, a, t], axis=-1)
        return jnp.pad(inp, ((0, 0), (0, fm.LANES - inp.shape[-1])))

    @jax.jit
    def packed_fwd(ws, inp, sx, sd):
        return jnp.sum(fm._fused_fwd(ws, inp, sx, sd, **meta_kw))

    @jax.jit
    def packed_fwdbwd(ws, inp, sx, sd, g):
        outs = fm._fused_bwd(ws, inp, sx, sd, g, **meta_kw)
        # weight grads in packed layout + d(input): the packed-params train
        # state would consume these directly (optimizer on packed layout)
        return sum(jnp.sum(o) for o in outs[:len(ws)]) + jnp.sum(outs[-1])

    @jax.jit
    def pack_only(p):
        return sum(jnp.sum(w.astype(jnp.float32))
                   for w in fm.pack_weights(p, a_dim, has_t, jnp.bfloat16))

    for N in (524288, 131072):
        xyz = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        a = jnp.asarray(rng.normal(0, 1, (N, 48)), jnp.float32)
        t = jnp.asarray(rng.normal(0, 1, (N, 16)), jnp.float32)
        inp = jax.jit(pack_input)(xyz, d, a, t)
        inp = jax.block_until_ready(inp)
        g = jnp.ones((N, fm.LANES), jnp.float32)

        bench(f"xla_fwd_N{N}", jax.jit(xla_apply), mp, xyz, d, a, t)
        bench(f"xla_fwdbwd_N{N}", jax.jit(xla_loss), mp, xyz, d, a, t)
        d_ray, a_ray, t_ray = d[::S], a[::S], t[::S]
        bench(f"xla_rayc_fwd_N{N}", jax.jit(xla_rayc),
              mp, xyz, d_ray, a_ray, t_ray)
        bench(f"xla_rayc_fwdbwd_N{N}", jax.jit(xla_rayc_loss),
              mp, xyz, d_ray, a_ray, t_ray)
        bench(f"pallas_wrapped_fwd_N{N}", jax.jit(wrapped_fwd),
              mp, xyz, d, a, t)
        bench(f"pallas_wrapped_fwdbwd_N{N}", jax.jit(wrapped_loss),
              mp, xyz, d, a, t)
        bench(f"pallas_packed_fwd_N{N}", packed_fwd, ws, inp, sx, sd)
        bench(f"pallas_packed_fwdbwd_N{N}", packed_fwdbwd, ws, inp, sx, sd, g)
    bench("pack_only", pack_only, mp, k=50)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()

"""Attribute the fused kernel's time: pure matmul-chain ceiling in Pallas,
cost of skip-concat vs split-matmul, and matmul-PE vs VPU-PE.

Run: nohup python experiments/kernel_anatomy.py > experiments/anatomy.log 2>&1 &
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

N = 524288
T = 2048
RESULTS = {}


def bench(name, f, *args, k=30):
    try:
        float(f(*args))
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
        RESULTS[name] = None
        return
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
    with open("experiments/anatomy_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def tile_spec(cols, t=T):
    return pl.BlockSpec((t, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def run_kernel(kernel, ins, in_specs, out_cols, sem="arbitrary"):
    return pl.pallas_call(
        kernel, grid=(N // T,), in_specs=in_specs,
        out_specs=tile_spec(out_cols),
        out_shape=jax.ShapeDtypeStruct((N, out_cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )(*ins)


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(0, 0.05, (256, 256)), jnp.bfloat16)
          for _ in range(8)]
    bs = [jnp.asarray(rng.normal(0, 0.05, (1, 256)), jnp.float32)
          for _ in range(8)]
    w4c = jnp.asarray(rng.normal(0, 0.05, (384, 256)), jnp.bfloat16)
    x256 = jnp.asarray(rng.normal(0, 1, (N, 256)), jnp.bfloat16)
    x128 = jnp.asarray(rng.normal(0, 1, (N, 128)), jnp.float32)

    # ---- 1. pure 8-layer chain: Pallas matmul ceiling ----
    def chain8_kernel(*refs):
        w = refs[:16]
        x_ref, o_ref = refs[16], refs[17]
        h = x_ref[:]
        for i in range(8):
            y = jnp.dot(h, w[2 * i][:], preferred_element_type=jnp.float32)
            h = jnp.maximum(y + w[2 * i + 1][:], 0.0).astype(jnp.bfloat16)
        o_ref[:] = h[:, :128].astype(jnp.float32)

    ins = []
    specs = []
    for i in range(8):
        ins += [ws[i], bs[i]]
        specs += [const_spec((256, 256)), const_spec((1, 256))]

    for sem in ("arbitrary", "parallel"):
        f = jax.jit(lambda x, sem=sem: jnp.sum(run_kernel(
            chain8_kernel, ins + [x], specs + [tile_spec(256)], 128, sem)))
        bench(f"chain8_{sem}", f, x256)

    # ---- 2. chain with concat skip vs split-matmul skip ----
    def concat_kernel(*refs):
        w = refs[:16]
        w4 = refs[16]
        x_ref, o_ref = refs[17], refs[18]
        x = x_ref[:]
        h = x
        for i in range(8):
            if i == 4:
                hin = jnp.concatenate([x[:, :128], h], axis=-1)
                y = jnp.dot(hin, w4[:],
                            preferred_element_type=jnp.float32)
            else:
                y = jnp.dot(h, w[2 * i][:],
                            preferred_element_type=jnp.float32)
            h = jnp.maximum(y + w[2 * i + 1][:], 0.0).astype(jnp.bfloat16)
        o_ref[:] = h[:, :128].astype(jnp.float32)

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        concat_kernel, ins + [w4c, x],
        specs + [const_spec((384, 256)), tile_spec(256)], 128)))
    bench("chain8_concat_skip", f, x256)

    def split_kernel(*refs):
        w = refs[:16]
        w4 = refs[16]
        x_ref, o_ref = refs[17], refs[18]
        x = x_ref[:]
        h = x
        for i in range(8):
            if i == 4:
                y = (jnp.dot(x[:, :128], w4[:][:128],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(h, w4[:][128:],
                               preferred_element_type=jnp.float32))
            else:
                y = jnp.dot(h, w[2 * i][:],
                            preferred_element_type=jnp.float32)
            h = jnp.maximum(y + w[2 * i + 1][:], 0.0).astype(jnp.bfloat16)
        o_ref[:] = h[:, :128].astype(jnp.float32)

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        split_kernel, ins + [w4c, x],
        specs + [const_spec((384, 256)), tile_spec(256)], 128)))
    bench("chain8_split_skip", f, x256)

    # ---- 3. PE: f32 matmul vs VPU broadcast ----
    import nerf_fl_tpu.ops.fused_mlp as fm
    c = fm._encoder_consts(10, 4, 48, True)
    Px = jnp.asarray(c["Px"])
    phx = jnp.asarray(c["phx"])
    trgx = jnp.asarray(c["trgx"])
    sx = jnp.ones((1, 128), jnp.float32)

    def pe_mm_kernel(P, ph, trg, s, x_ref, o_ref):
        inp = x_ref[:]
        E = jnp.dot(inp, P[:], preferred_element_type=jnp.float32)
        pe = jnp.where(trg[:] > 0, jnp.sin(E + ph[:]), E) * s[:]
        o_ref[:] = pe

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        pe_mm_kernel,
        [Px, phx, trgx, sx, x],
        [const_spec((128, 128))] + [const_spec((1, 128))] * 3
        + [tile_spec(128)], 128)))
    bench("pe_matmul_f32", f, x128)

    def pe_vpu_kernel(P, ph, trg, s, x_ref, o_ref):
        inp = x_ref[:]
        E = jnp.zeros((T, 128), jnp.float32)
        for cc in range(3):
            E = E + jnp.broadcast_to(inp[:, cc:cc + 1], (T, 128)) * P[cc, :]
        pe = jnp.where(trg[:] > 0, jnp.sin(E + ph[:]), E) * s[:]
        o_ref[:] = pe

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        pe_vpu_kernel,
        [Px, phx, trgx, sx, x],
        [const_spec((128, 128))] + [const_spec((1, 128))] * 3
        + [tile_spec(128)], 128)))
    bench("pe_vpu_bcast", f, x128)

    # sin-only cost
    def sin_kernel(x_ref, o_ref):
        o_ref[:] = jnp.sin(x_ref[:])

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        sin_kernel, [x], [tile_spec(128)], 128)))
    bench("sin_only", f, x128)

    # ---- 4. bf16 PE matmul (rate check; not precision-valid) ----
    def pe_mm_bf16_kernel(P, ph, trg, s, x_ref, o_ref):
        inp = x_ref[:].astype(jnp.bfloat16)
        E = jnp.dot(inp, P[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        pe = jnp.where(trg[:] > 0, jnp.sin(E + ph[:]), E) * s[:]
        o_ref[:] = pe

    f = jax.jit(lambda x: jnp.sum(run_kernel(
        pe_mm_bf16_kernel,
        [Px, phx, trgx, sx, x],
        [const_spec((128, 128))] + [const_spec((1, 128))] * 3
        + [tile_spec(128)], 128)))
    bench("pe_matmul_bf16", f, x128)

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()

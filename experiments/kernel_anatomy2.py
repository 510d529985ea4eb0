"""Incremental kernel builds to locate the fused kernel's hidden cost.

a) staticnet:      trunk8(real shapes)+fs2+dir+rgb from pre-encoded inputs
b) fullnet_nope:   a) + transient branch
c) pe_only:        v4's VPU-PE encoders alone (broadcast FMA + poly trig + rolls)
d) staticnet_consol: a) with operands consolidated (W_mid stacked, one bias row)

Run: nohup python experiments/kernel_anatomy2.py > experiments/anatomy2.log 2>&1 &
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from nerf_fl_tpu.ops.fused_mlp import (_encoder_consts, _pe_trig,
                                       default_scale_rows)  # noqa: E402

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
    with open("experiments/anatomy2_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def tile_spec(cols, t=T):
    return pl.BlockSpec((t, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def run(kernel, ins, in_specs, out_cols):
    return pl.pallas_call(
        kernel, grid=(N // T,), in_specs=in_specs,
        out_specs=tile_spec(out_cols),
        out_shape=jax.ShapeDtypeStruct((N, out_cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*ins)


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def W(r, c):
        return jnp.asarray(rng.normal(0, 0.05, (r, c)), bf)

    def B(c):
        return jnp.asarray(rng.normal(0, 0.05, (1, c)), jnp.float32)

    # real trunk shapes
    trunk = []
    for i in range(8):
        rows = 128 if i == 0 else (384 if i == 4 else 256)
        trunk += [W(rows, 256), B(256)]
    wfs, bfs = W(256, 384), B(384)
    wd, bd = W(384, 128), B(128)
    wr, br = W(128, 128), B(128)
    wt0, bt0 = W(384, 128), B(128)
    wtm = [W(128, 128) for _ in range(3)]
    btm = [B(128) for _ in range(3)]
    wth, bth = W(128, 128), B(128)

    pe_in = jnp.asarray(rng.normal(0, 1, (N, 128)), bf)
    dt_in = jnp.asarray(rng.normal(0, 1, (N, 128)), bf)
    tt_in = jnp.asarray(rng.normal(0, 1, (N, 128)), bf)

    def dense(a, wv, bv):
        y = jnp.dot(a, wv, preferred_element_type=jnp.float32)
        return jnp.maximum(y.astype(bf) + bv.astype(bf), 0)

    # ---- a) staticnet ----
    def static_kernel(*refs):
        tw = refs[:16]
        wfs_r, bfs_r, wd_r, bd_r, wr_r, br_r = refs[16:22]
        pe_r, dt_r = refs[22], refs[23]
        o_r = refs[24]
        pe = pe_r[:]
        h = pe
        for i in range(8):
            if i == 4:
                h = jnp.concatenate([pe, h], axis=-1)
            h = dense(h, tw[2 * i][:], tw[2 * i + 1][:])
        fs2 = jnp.dot(h, wfs_r[:], preferred_element_type=jnp.float32) \
            + bfs_r[:]
        din = jnp.concatenate([fs2[:, :256].astype(bf), dt_r[:]], axis=-1)
        hd = dense(din, wd_r[:], bd_r[:])
        o_r[:] = (jnp.dot(hd, wr_r[:], preferred_element_type=jnp.float32)
                  + br_r[:] + fs2[:, 256:])

    static_ins = trunk + [wfs, bfs, wd, bd, wr, br, pe_in, dt_in]
    static_specs = ([const_spec(x.shape) for x in trunk]
                    + [const_spec(wfs.shape), const_spec(bfs.shape),
                       const_spec(wd.shape), const_spec(bd.shape),
                       const_spec(wr.shape), const_spec(br.shape),
                       tile_spec(128), tile_spec(128)])
    f = jax.jit(lambda a, b: jnp.sum(run(static_kernel,
                                         static_ins[:-2] + [a, b],
                                         static_specs, 128)))
    bench("staticnet", f, pe_in, dt_in)

    # ---- b) + transient ----
    def full_kernel(*refs):
        tw = refs[:16]
        wfs_r, bfs_r, wd_r, bd_r, wr_r, br_r = refs[16:22]
        wt0_r, bt0_r = refs[22], refs[23]
        wtm_r = refs[24:27]
        btm_r = refs[27:30]
        wth_r, bth_r = refs[30], refs[31]
        pe_r, dt_r, tt_r = refs[32], refs[33], refs[34]
        o_r = refs[35]
        pe = pe_r[:]
        h = pe
        for i in range(8):
            if i == 4:
                h = jnp.concatenate([pe, h], axis=-1)
            h = dense(h, tw[2 * i][:], tw[2 * i + 1][:])
        fs2 = jnp.dot(h, wfs_r[:], preferred_element_type=jnp.float32) \
            + bfs_r[:]
        xf = fs2[:, :256].astype(bf)
        din = jnp.concatenate([xf, dt_r[:]], axis=-1)
        hd = dense(din, wd_r[:], bd_r[:])
        out = (jnp.dot(hd, wr_r[:], preferred_element_type=jnp.float32)
               + br_r[:] + fs2[:, 256:])
        tin = jnp.concatenate([xf, tt_r[:]], axis=-1)
        th = dense(tin, wt0_r[:], bt0_r[:])
        for k in range(3):
            th = dense(th, wtm_r[k][:], btm_r[k][:])
        out = out + (jnp.dot(th, wth_r[:],
                             preferred_element_type=jnp.float32) + bth_r[:])
        o_r[:] = out

    full_ins = (trunk + [wfs, bfs, wd, bd, wr, br, wt0, bt0] + wtm + btm
                + [wth, bth, pe_in, dt_in, tt_in])
    full_specs = ([const_spec(x.shape) for x in full_ins[:-3]]
                  + [tile_spec(128)] * 3)
    f = jax.jit(lambda a, b, c: jnp.sum(run(
        full_kernel, full_ins[:-3] + [a, b, c], full_specs, 128)))
    bench("fullnet_nope", f, pe_in, dt_in, tt_in)

    # ---- c) pe_only (v4 encoders) ----
    c = _encoder_consts(10, 4, 48)
    sx, sd = default_scale_rows(10, 4, 48)
    enc = [jnp.asarray(c["PxR"]), jnp.asarray(c["phx"]),
           jnp.asarray(c["trgx"]), sx,
           jnp.asarray(c["PdR"]), jnp.asarray(c["phd"]),
           jnp.asarray(c["trgd"]), sd, jnp.asarray(c["ma"])]
    inp_f32 = jnp.asarray(rng.normal(0, 1, (N, 128)), jnp.float32)

    def pe_kernel(*refs):
        PxR, phx, trgx, sx_r, PdR, phd, trgd, sd_r, ma = refs[:9]
        inp_r, o_r = refs[9], refs[10]
        inp = inp_r[:]

        def accum(rows, off):
            E = jnp.broadcast_to(inp[:, off:off + 1], (T, 128)) * rows[0:1, :]
            for cc in (1, 2):
                E = E + jnp.broadcast_to(inp[:, off + cc:off + cc + 1],
                                         (T, 128)) * rows[cc:cc + 1, :]
            return E

        Ex = accum(PxR, 0)
        pe = (jnp.where(trgx[:] > 0, _pe_trig(Ex, phx[:]), Ex) * sx_r[:])
        Ed = accum(PdR, 3)
        dt = jnp.where(trgd[:] > 0, _pe_trig(Ed, phd[:]), Ed) * sd_r[:]
        dt = jnp.where(ma[:] > 0, pltpu.roll(inp, shift=21, axis=1), dt)
        tt = pltpu.roll(inp, shift=74, axis=1)
        o_r[:] = pe + dt + tt

    f = jax.jit(lambda x: jnp.sum(run(
        pe_kernel, enc + [x],
        [const_spec(np.asarray(e).shape) for e in enc] + [tile_spec(128)],
        128)))
    bench("pe_only_vpu", f, inp_f32)

    # ---- d) staticnet with consolidated operands ----
    w_mid = jnp.concatenate([trunk[2 * i] for i in (1, 2, 3, 5, 6, 7)], 1)
    b_all = jnp.concatenate([trunk[2 * i + 1] for i in range(8)], 1)

    def consol_kernel(w0_r, wmid_r, wskip_r, ball_r, wfs_r, bfs_r, wd_r,
                      bd_r, wr_r, br_r, pe_r, dt_r, o_r):
        pe = pe_r[:]
        mid = [1, 2, 3, 5, 6, 7]
        h = pe
        j = 0
        for i in range(8):
            if i == 4:
                h = jnp.concatenate([pe, h], axis=-1)
                wv = wskip_r[:]
            elif i == 0:
                wv = w0_r[:]
            else:
                wv = wmid_r[:, 256 * j:256 * (j + 1)]
                j += 1
            bv = ball_r[:, 256 * i:256 * (i + 1)]
            h = dense(h, wv, bv)
        fs2 = jnp.dot(h, wfs_r[:], preferred_element_type=jnp.float32) \
            + bfs_r[:]
        din = jnp.concatenate([fs2[:, :256].astype(bf), dt_r[:]], axis=-1)
        hd = dense(din, wd_r[:], bd_r[:])
        o_r[:] = (jnp.dot(hd, wr_r[:], preferred_element_type=jnp.float32)
                  + br_r[:] + fs2[:, 256:])

    consol_ins = [trunk[0], w_mid, trunk[8], b_all, wfs, bfs, wd, bd, wr, br]
    consol_specs = [const_spec(np.asarray(x).shape) for x in consol_ins] \
        + [tile_spec(128), tile_spec(128)]
    f = jax.jit(lambda a, b: jnp.sum(run(
        consol_kernel, consol_ins + [a, b], consol_specs, 128)))
    bench("staticnet_consol", f, pe_in, dt_in)

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()

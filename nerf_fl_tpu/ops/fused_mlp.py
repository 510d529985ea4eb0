"""Fused positional-encoding + NeRF-W MLP as a Pallas TPU kernel (fwd + VJP).

Why: the MLP dominates the train step and the XLA lowering is HBM-bound —
every inter-layer (N, 256) activation round-trips HBM, and the positional
encodings are materialized as (N, 63)/(N, 75)/(N, 16) f32 arrays that each
physically occupy (N, 128) lanes in HBM.  Measured on v5e at N=524k, bf16:
XLA MLP fwd 8.2 ms / fwd+bwd 22.1 ms, plus ~4 ms of PE + packing.

This kernel runs PE -> trunk(8x256, skip@4) -> heads -> transient branch for
a tile of sample points entirely in VMEM:

  * ONE packed (N, 128) f32 input: [xyz(3) | dir(3) | a(a_dim) | t(16)].
  * In-kernel positional encoding with NO matmuls and NO libm trig:
      - E = sum_c broadcast(inp[:, c]) * row_c — three VPU fused
        multiply-adds per encoder against constant (1, 128) frequency rows
        (f32-exact; an f32 MXU projector costs ~0.7 ms per encoder at 1/8
        rate, and bf16 would destroy the 2^k * x arguments);
      - trig = _pe_trig(E, quarter_turns): Cody-Waite reduction + odd
        polynomial, with cos as a +1/4-turn phase applied after reduction
        in turn units (measured: full-width libm jnp.sin costs 3 ms per
        (524k, 128) f32 array on v5e — it dominated the whole kernel);
      - the appearance / transient identity columns move by lane rolls.
    Column order matches the reference exactly ([x, sin f0 x, cos f0 x,
    sin f1 x, ...], reference models/nerf.py:14-32; core/encoding.py here).
    The per-column ``scale`` row doubles as the BARF annealing hook
    (reference nerf.py:61-77): identity columns 1, frequency blocks carry
    the annealing weight, padding 0.
  * Head packing IS the weight padding: the rgb / sigma / transient heads
    write disjoint columns of one (N, 128) f32 output because their padded
    weight matrices have zeros everywhere else.  No masks or rolls — and in
    the backward pass the zero columns also zero out all cross-terms, so the
    full output cotangent can be pushed through every head unmasked.
  * Hidden layers accumulate matmuls in f32 (Mosaic requires 32-bit
    accumulators), round to the compute dtype, then run bias+relu in bf16 —
    the same rounding point as the XLA path (models/mlp.py:_dense); heads
    emit f32.
  * The backward kernel recomputes the forward per tile (flash-attention
    style) and accumulates weight grads in f32 VMEM across the sequential
    grid; d(input) is one packed (N, 128) f32 array assembled by per-column
    reductions + reverse rolls, which XLA's autodiff of the (traced) packing
    concat routes back to xyz / dir / embeddings.

Replaces the hot loop at reference rendering.py:119-130 (chunked PE + MLP).
"""
from __future__ import annotations

import functools
import os as _os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(_os.environ.get("FUSED_MLP_TILE", 512))            # bwd tile (1024 exceeds the 16M VMEM scoped limit: dW accumulators double-buffer)
TILE_FWD = int(_os.environ.get("FUSED_MLP_TILE_FWD", 2048))   # fwd tile
LANES = 128

IN_X = 128          # pe(xyz): 63 -> 128
W_TRUNK = 256
W_HALF = 128
SKIP_IN = IN_X + W_TRUNK        # 384
FS_OUT = W_TRUNK + LANES        # [xyz_final(256) | sigma @ col 256+3] -> 384
BR_IN = W_TRUNK + LANES         # [xyz_final | dir-tail/t-tail pad] -> 384

# packed output columns
COL_S_RGB = 0       # 0..2
COL_S_SIGMA = 3
COL_T_RGB = 4       # 4..6
COL_T_SIGMA = 7
COL_T_BETA = 8

N_STATIC_W = 8 * 2 + 2 + 2 + 2   # trunk pairs + fs2 + dir + rgb-head
N_TRANS_W = 5 * 2                # t0..t3 + fused transient heads
N_ENC = 9  # PxR, phx, trgx, sx, PdR, phd, trgd, sd, ma

# Cody-Waite polynomial trig, shared with the XLA bf16 PE path
from ..core.encoding import sin_cw as _pe_trig
from ..core.encoding import fast_cos as _fast_cos
from ..core.encoding import fast_sin as _fast_sin


def _pad_to(x, rows=None, cols=None):
    r = 0 if rows is None else rows - x.shape[0]
    c = 0 if cols is None else cols - x.shape[-1]
    if x.ndim == 1:
        return jnp.pad(x, (0, c))
    return jnp.pad(x, ((0, r), (0, c)))


# ----------------------------------------------------------------------
# encoder constants (pure numpy, cached)
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _encoder_consts(n_freq_xyz: int, n_freq_dir: int, a_dim: int):
    """Constant frequency rows + phase/trig/mask rows.

    PxR/PdR: (3, 128) — row c holds the coefficient of input component c
    for every PE output column ({1 on the identity column, 2^k on that
    frequency's sin AND cos columns}; zero elsewhere, so accumulated E has
    no garbage lanes).  ph rows are quarter-turn phases (0.25 on cos
    columns), trg rows mark trig columns, ma marks the appearance identity
    columns of the dir-tail.  Column layout matches core/encoding.posenc:
    [x(3), sin(f0 x)(3), cos(f0 x)(3), sin(f1 x)(3), ...], f_k = 2^k.
    Input column layout: [xyz 0:3 | dir 3:6 | a 6:6+a_dim | t ...:+16].
    """
    def pe_rows(n_freq):
        R = np.zeros((3, LANES), np.float32)
        ph = np.zeros((1, LANES), np.float32)
        trg = np.zeros((1, LANES), np.float32)
        for c in range(3):
            R[c, c] = 1.0  # identity block
        for k in range(n_freq):
            f = float(2.0 ** k)
            base = 3 + 6 * k
            for c in range(3):
                R[c, base + c] = f            # sin block
                R[c, base + 3 + c] = f        # cos block
                trg[0, base + c] = 1.0
                trg[0, base + 3 + c] = 1.0
                ph[0, base + 3 + c] = 0.25    # cos = sin(+1/4 turn)
        return R, ph, trg

    PxR, phx, trgx = pe_rows(n_freq_xyz)
    PdR, phd, trgd = pe_rows(n_freq_dir)
    d_pe_dim = 3 + 6 * n_freq_dir
    ma = np.zeros((1, LANES), np.float32)
    ma[0, d_pe_dim:d_pe_dim + a_dim] = 1.0
    return {"PxR": PxR, "phx": phx, "trgx": trgx,
            "PdR": PdR, "phd": phd, "trgd": trgd, "ma": ma}


def default_scale_rows(n_freq_xyz: int, n_freq_dir: int, a_dim: int,
                       barf_w_xyz=None, barf_w_dir=None):
    """(1,128) per-column scale rows: 1 on identity cols, the BARF annealing
    weight (or 1) on each frequency's sin/cos block, 0 on padding."""
    def row(n_freq, extra_ident, w):
        ident = jnp.ones((3,), jnp.float32)
        wf = jnp.ones((n_freq,), jnp.float32) if w is None \
            else jnp.asarray(w, jnp.float32)
        freq = jnp.repeat(wf, 6)
        tail = jnp.ones((extra_ident,), jnp.float32)
        r = jnp.concatenate([ident, freq, tail])
        return jnp.pad(r, (0, LANES - r.shape[0]))[None, :]
    return (row(n_freq_xyz, 0, barf_w_xyz),
            row(n_freq_dir, a_dim, barf_w_dir))


# ----------------------------------------------------------------------
# weight packing
# ----------------------------------------------------------------------

def pack_weights(params: Dict[str, Any], a_dim: int, has_transient: bool,
                 dtype=jnp.bfloat16):
    """Pad the parameter pytree into the kernel's fixed layout (flat list in
    kernel argument order).  Head columns land at their packed output
    positions; all padding is zero, which the backward pass relies on."""
    f32 = jnp.float32
    ws = []
    n_xyz_in = params["xyz"][0]["w"].shape[0]  # 63 unpadded
    for i, layer in enumerate(params["xyz"]):
        if i == 0:
            w = _pad_to(layer["w"], rows=IN_X)
        elif i == 4:
            # kernel concat is [pe(128) | h(256)]: pe rows land at 0..62
            w = jnp.concatenate([
                _pad_to(layer["w"][:n_xyz_in], rows=IN_X),
                layer["w"][n_xyz_in:]], axis=0)
        else:
            w = layer["w"]
        ws.append(w.astype(dtype))
        ws.append(_pad_to(layer["b"].reshape(1, -1)).astype(f32))
    # fs2 = [xyz_final(256) | static_sigma at col 256+COL_S_SIGMA]: (256, 384)
    sig_cols = jnp.zeros((W_TRUNK, LANES), f32)
    sig_cols = sig_cols.at[:, COL_S_SIGMA:COL_S_SIGMA + 1].set(
        params["static_sigma"]["w"])
    wfs = jnp.concatenate([params["xyz_final"]["w"], sig_cols], axis=1)
    bfs = jnp.concatenate([
        params["xyz_final"]["b"],
        jnp.zeros((LANES,), f32).at[COL_S_SIGMA].set(
            params["static_sigma"]["b"][0])])
    ws.append(wfs.astype(dtype))
    ws.append(bfs.reshape(1, -1).astype(f32))
    # dir branch: (384, 128) from (256 + 27 + a_dim)
    wd = params["dir"]["w"]
    wd = jnp.concatenate([
        wd[:W_TRUNK], _pad_to(wd[W_TRUNK:], rows=LANES)], axis=0)
    ws.append(wd.astype(dtype))
    ws.append(_pad_to(params["dir"]["b"].reshape(1, -1)).astype(f32))
    # static rgb head at output cols 0..2
    ws.append(_pad_to(params["static_rgb"]["w"], cols=LANES).astype(dtype))
    ws.append(_pad_to(params["static_rgb"]["b"].reshape(1, -1),
                      cols=LANES).astype(f32))
    if has_transient:
        tp = params["transient"]
        w0 = tp["layers"][0]["w"]  # (256+16, 128)
        w0 = jnp.concatenate([
            w0[:W_TRUNK], _pad_to(w0[W_TRUNK:], rows=LANES)], axis=0)
        ws.append(w0.astype(dtype))
        ws.append(tp["layers"][0]["b"].reshape(1, -1).astype(f32))
        for layer in tp["layers"][1:]:
            ws.append(layer["w"].astype(dtype))
            ws.append(layer["b"].reshape(1, -1).astype(f32))
        # transient heads at output cols 4..8: [rgb(3) | sigma | beta]
        wth = jnp.zeros((W_HALF, LANES), f32)
        wth = wth.at[:, COL_T_RGB:COL_T_RGB + 3].set(tp["rgb"]["w"])
        wth = wth.at[:, COL_T_SIGMA:COL_T_SIGMA + 1].set(tp["sigma"]["w"])
        wth = wth.at[:, COL_T_BETA:COL_T_BETA + 1].set(tp["beta"]["w"])
        bth = jnp.zeros((LANES,), f32)
        bth = bth.at[COL_T_RGB:COL_T_RGB + 3].set(tp["rgb"]["b"])
        bth = bth.at[COL_T_SIGMA].set(tp["sigma"]["b"][0])
        bth = bth.at[COL_T_BETA].set(tp["beta"]["b"][0])
        ws.append(wth.astype(dtype))
        ws.append(bth.reshape(1, -1).astype(f32))
    return ws


def unpack_weight_grads(grads, params, a_dim: int, has_transient: bool):
    """Slice padded kernel weight-grads back into the parameter pytree."""
    it = iter(grads)
    out = {"xyz": []}
    n_xyz_in = params["xyz"][0]["w"].shape[0]
    for i, layer in enumerate(params["xyz"]):
        dw = next(it)
        db = next(it)
        if i == 4:
            dw = jnp.concatenate([dw[:n_xyz_in], dw[IN_X:]], axis=0)
        else:
            dw = dw[:layer["w"].shape[0]]
        out["xyz"].append({"w": dw.astype(jnp.float32),
                           "b": db[0, :layer["b"].shape[0]].astype(jnp.float32)})
    dwfs = next(it)
    dbfs = next(it)
    out["xyz_final"] = {"w": dwfs[:, :W_TRUNK].astype(jnp.float32),
                        "b": dbfs[0, :W_TRUNK].astype(jnp.float32)}
    c = W_TRUNK + COL_S_SIGMA
    out["static_sigma"] = {"w": dwfs[:, c:c + 1].astype(jnp.float32),
                           "b": dbfs[0, c:c + 1].astype(jnp.float32)}
    dwd = next(it)
    dbd = next(it)
    nd = params["dir"]["w"].shape[0] - W_TRUNK  # 27 + a_dim
    out["dir"] = {"w": jnp.concatenate(
        [dwd[:W_TRUNK], dwd[W_TRUNK:W_TRUNK + nd]]).astype(jnp.float32),
        "b": dbd[0].astype(jnp.float32)}
    dwr = next(it)
    dbr = next(it)
    out["static_rgb"] = {"w": dwr[:, :3].astype(jnp.float32),
                         "b": dbr[0, :3].astype(jnp.float32)}
    if has_transient:
        tp = {"layers": []}
        dw0 = next(it)
        db0 = next(it)
        nt = params["transient"]["layers"][0]["w"].shape[0] - W_TRUNK
        tp["layers"].append({"w": jnp.concatenate(
            [dw0[:W_TRUNK], dw0[W_TRUNK:W_TRUNK + nt]]).astype(jnp.float32),
            "b": db0[0].astype(jnp.float32)})
        for _ in range(3):
            dw = next(it)
            db = next(it)
            tp["layers"].append({"w": dw.astype(jnp.float32),
                                 "b": db[0].astype(jnp.float32)})
        dwth = next(it)
        dbth = next(it)
        tp["rgb"] = {"w": dwth[:, COL_T_RGB:COL_T_RGB + 3].astype(jnp.float32),
                     "b": dbth[0, COL_T_RGB:COL_T_RGB + 3].astype(jnp.float32)}
        tp["sigma"] = {
            "w": dwth[:, COL_T_SIGMA:COL_T_SIGMA + 1].astype(jnp.float32),
            "b": dbth[0, COL_T_SIGMA:COL_T_SIGMA + 1].astype(jnp.float32)}
        tp["beta"] = {
            "w": dwth[:, COL_T_BETA:COL_T_BETA + 1].astype(jnp.float32),
            "b": dbth[0, COL_T_BETA:COL_T_BETA + 1].astype(jnp.float32)}
        out["transient"] = tp
    return out


# ----------------------------------------------------------------------
# in-kernel encoders
# ----------------------------------------------------------------------

def _accum_pe(inp, rows_ref, src_off, tile):
    """E = sum_c broadcast(inp[:, src_off+c]) * rows[c] — VPU-only, f32."""
    E = jnp.broadcast_to(inp[:, src_off:src_off + 1],
                         (tile, LANES)) * rows_ref[0:1, :]
    for c in (1, 2):
        E = E + jnp.broadcast_to(inp[:, src_off + c:src_off + c + 1],
                                 (tile, LANES)) * rows_ref[c:c + 1, :]
    return E


def _encode_inputs(inp, enc, a_shift, t_shift, dtype, tile, has_transient):
    """Returns (pe_x, d_tail, t_tail) — the network inputs in the compute
    dtype.  The pre-trig accumulators are NOT retained; the backward pass
    recomputes them (6 VPU FMAs) rather than keeping two (T, 128) f32
    arrays live across the whole matmul sweep."""
    PxR, phx, trgx, sx, PdR, phd, trgd, sd, ma = enc
    Ex = _accum_pe(inp, PxR, 0, tile)
    pe_x = (jnp.where(trgx[:] > 0, _pe_trig(Ex, phx[:]), Ex)
            * sx[:]).astype(dtype)
    Ed = _accum_pe(inp, PdR, 3, tile)
    d_tail_f = jnp.where(trgd[:] > 0, _pe_trig(Ed, phd[:]), Ed) * sd[:]
    if a_shift:
        d_tail_f = jnp.where(ma[:] > 0, pltpu.roll(inp, shift=a_shift,
                                                   axis=1), d_tail_f)
    d_tail = d_tail_f.astype(dtype)
    t_tail = None
    if has_transient:
        # garbage lanes beyond col 16 hit zero-padded W_t0 rows: no mask
        t_tail = pltpu.roll(inp, shift=t_shift, axis=1).astype(dtype)
    return pe_x, d_tail, t_tail


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

def _fwd_kernel(has_transient, dtype, a_shift, t_shift, tile, *refs):
    """refs (in): [weights..., PxR, phx, trgx, sx, PdR, phd, trgd, sd, ma,
                   inp]; (out): [out]"""
    nw = N_STATIC_W + (N_TRANS_W if has_transient else 0)
    w = refs[:nw]
    enc = refs[nw:nw + N_ENC]
    inp_ref = refs[nw + N_ENC]
    out_ref = refs[nw + N_ENC + 1]

    def dense(a, wi):
        # Mosaic requires 32-bit matmul accumulators; round to the compute
        # dtype before bias+relu (same rounding point as the XLA path)
        y = jnp.dot(a, w[wi][:], preferred_element_type=jnp.float32)
        return jnp.maximum(y.astype(dtype) + w[wi + 1][:].astype(dtype), 0)

    inp = inp_ref[:]  # (T, 128) f32
    pe, d_tail, t_tail = _encode_inputs(
        inp, enc, a_shift, t_shift, dtype, tile, has_transient)

    h = pe
    for i in range(8):
        if i == 4:
            h = jnp.concatenate([pe, h], axis=-1)
        h = dense(h, 2 * i)
    fs2 = jnp.dot(h, w[16][:], preferred_element_type=jnp.float32) + w[17][:]
    xyz_final = fs2[:, :W_TRUNK].astype(dtype)
    din = jnp.concatenate([xyz_final, d_tail], axis=-1)
    hd = dense(din, 18)
    out = (jnp.dot(hd, w[20][:], preferred_element_type=jnp.float32)
           + w[21][:] + fs2[:, W_TRUNK:])              # rgb cols + sigma col
    if has_transient:
        tin = jnp.concatenate([xyz_final, t_tail], axis=-1)
        th = dense(tin, 22)
        for k in range(3):
            th = dense(th, 24 + 2 * k)
        out = out + (jnp.dot(th, w[30][:],
                             preferred_element_type=jnp.float32) + w[31][:])
    out_ref[:] = out


def _bwd_kernel(has_transient, dtype, a_shift, t_shift, tile, *refs):
    """refs (in): [weights..., encoder consts..., inp, g]
       refs (out): [dW/db..., d_inp]"""
    nw = N_STATIC_W + (N_TRANS_W if has_transient else 0)
    w = refs[:nw]
    enc = refs[nw:nw + N_ENC]
    PxR, phx, trgx, sx, PdR, phd, trgd, sd, ma = enc
    inp_ref, g_ref = refs[nw + N_ENC:nw + N_ENC + 2]
    outs = refs[nw + N_ENC + 2:]
    dw_out = outs[:nw]
    din_ref = outs[nw]

    first = pl.program_id(0) == 0

    def acc(idx, dw, db):
        @pl.when(first)
        def _():
            dw_out[idx][:] = dw
            dw_out[idx + 1][:] = db

        @pl.when(jnp.logical_not(first))
        def _():
            dw_out[idx][:] += dw
            dw_out[idx + 1][:] += db

    def dense_fwd(a, wi):
        y = jnp.dot(a, w[wi][:], preferred_element_type=jnp.float32)
        return jnp.maximum(y.astype(dtype) + w[wi + 1][:].astype(dtype), 0)

    def dense_bwd(a_in, act_out, g, wi, relu=True):
        """Returns d_a_in (compute dtype); accumulates dW, db.

        Inter-layer cotangents stay in the compute dtype — the same choice
        XLA's autodiff makes for this net (its dgrad fusions emit bf16) —
        which halves VMEM pressure and VPU bytes on the backward sweep."""
        if relu:
            # compare in f32 — Mosaic lacks vector bf16 cmpf on this target
            g = jnp.where(act_out.astype(jnp.float32) > 0, g,
                          jnp.zeros_like(g))
        gc = g.astype(dtype)
        dw = jax.lax.dot_general(
            a_in, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        acc(wi, dw, db)
        da = jax.lax.dot_general(
            gc, w[wi][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return da.astype(dtype)

    # ---- forward recompute, activations live in VMEM ----
    inp = inp_ref[:]
    pe, d_tail, t_tail = _encode_inputs(
        inp, enc, a_shift, t_shift, dtype, tile, has_transient)

    acts_in, acts_out = [], []
    h = pe
    for i in range(8):
        if i == 4:
            h = jnp.concatenate([pe, h], axis=-1)
        acts_in.append(h)
        h = dense_fwd(h, 2 * i)
        acts_out.append(h)
    fs2 = jnp.dot(h, w[16][:], preferred_element_type=jnp.float32) + w[17][:]
    xyz_final = fs2[:, :W_TRUNK].astype(dtype)
    din = jnp.concatenate([xyz_final, d_tail], axis=-1)
    hd = dense_fwd(din, 18)

    # ---- backward ----
    g = g_ref[:]                                       # (T, 128) f32
    # static rgb head (zero-padded cols kill all cross-terms)
    d_hd = dense_bwd(hd, None, g.astype(dtype), 20, relu=False)
    d_din = dense_bwd(din, hd, d_hd, 18)
    d_xf = d_din[:, :W_TRUNK]
    d_dtail = d_din[:, W_TRUNK:]

    if has_transient:
        tin = jnp.concatenate([xyz_final, t_tail], axis=-1)
        tacts = [tin]
        th = dense_fwd(tin, 22)
        tacts.append(th)
        for k in range(3):
            th = dense_fwd(th, 24 + 2 * k)
            tacts.append(th)
        gt = dense_bwd(tacts[4], None, g.astype(dtype), 30, relu=False)
        for k in range(2, -1, -1):
            gt = dense_bwd(tacts[k + 1], tacts[k + 2], gt, 24 + 2 * k)
        d_tin = dense_bwd(tacts[0], tacts[1], gt, 22)
        d_xf = d_xf + d_tin[:, :W_TRUNK]
        d_ttail = d_tin[:, W_TRUNK:]

    # fs2 cotangent: [d_xyz_final | g] — padded fs2 columns are zero, so the
    # non-sigma columns of g contribute nothing through them
    d_fs2 = jnp.concatenate([d_xf, g.astype(dtype)], axis=-1)
    gg = dense_bwd(acts_out[7], None, d_fs2, 16, relu=False)
    for i in range(7, -1, -1):
        gg = dense_bwd(acts_in[i], acts_out[i], gg, 2 * i)
        if i == 4:
            d_pe_skip = gg[:, :IN_X]
            gg = gg[:, IN_X:]
    d_pe = gg + d_pe_skip

    # ---- PE backward: per-column chain rule, then project to input cols
    # dE = where(trig, cos, 1) * scale * d_pe; d_inp[c] = sum(dE * row_c)
    colid = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    Ex = _accum_pe(inp, PxR, 0, tile)
    Ed = _accum_pe(inp, PdR, 3, tile)
    dEx = jnp.where(trgx[:] > 0, _pe_trig(Ex, phx[:] + 0.25), 1.0) \
        * sx[:] * d_pe.astype(jnp.float32)
    dEd = jnp.where(ma[:] > 0, 0.0,
                    jnp.where(trgd[:] > 0, _pe_trig(Ed, phd[:] + 0.25), 1.0)
                    * sd[:]) * d_dtail.astype(jnp.float32)
    d_inp = jnp.zeros((tile, LANES), jnp.float32)
    for c in range(3):
        sxc = jnp.sum(dEx * PxR[c:c + 1, :], axis=1, keepdims=True)
        d_inp = d_inp + jnp.where(colid == c, sxc, 0.0)
        sdc = jnp.sum(dEd * PdR[c:c + 1, :], axis=1, keepdims=True)
        d_inp = d_inp + jnp.where(colid == 3 + c, sdc, 0.0)
    if a_shift:
        d_inp = d_inp + pltpu.roll(d_dtail.astype(jnp.float32) * ma[:],
                                   shift=(LANES - a_shift) % LANES, axis=1)
    if has_transient:
        # d_ttail lanes >= 16 are zero (zero-padded W_t0 rows)
        d_inp = d_inp + pltpu.roll(d_ttail.astype(jnp.float32),
                                   shift=(LANES - t_shift) % LANES, axis=1)
    din_ref[:] = d_inp


# ----------------------------------------------------------------------
# pallas_call wrappers
# ----------------------------------------------------------------------

def _weight_specs(has_transient):
    shapes = []
    for i in range(8):
        rows = IN_X if i == 0 else (SKIP_IN if i == 4 else W_TRUNK)
        shapes += [(rows, W_TRUNK), (1, W_TRUNK)]
    shapes += [(W_TRUNK, FS_OUT), (1, FS_OUT)]         # fs2
    shapes += [(BR_IN, W_HALF), (1, W_HALF)]           # dir
    shapes += [(W_HALF, LANES), (1, LANES)]            # rgb head
    if has_transient:
        shapes += [(BR_IN, W_HALF), (1, W_HALF)]
        shapes += [(W_HALF, W_HALF), (1, W_HALF)] * 3
        shapes += [(W_HALF, LANES), (1, LANES)]        # fused t heads
    return shapes


_ENC_SHAPES = [(3, LANES), (1, LANES), (1, LANES), (1, LANES),
               (3, LANES), (1, LANES), (1, LANES), (1, LANES), (1, LANES)]


def _enc_args(a_dim, n_freq_xyz, n_freq_dir, sx, sd):
    c = _encoder_consts(n_freq_xyz, n_freq_dir, a_dim)
    return [jnp.asarray(c["PxR"]), jnp.asarray(c["phx"]),
            jnp.asarray(c["trgx"]), sx,
            jnp.asarray(c["PdR"]), jnp.asarray(c["phd"]),
            jnp.asarray(c["trgd"]), sd, jnp.asarray(c["ma"])]


def _shifts(n_freq_dir, a_dim):
    d_pe_dim = 3 + 6 * n_freq_dir
    a_shift = (d_pe_dim - 6) if a_dim else 0       # inp col 6 -> dtail col 27
    t_shift = (-(6 + a_dim)) % LANES               # inp t cols -> t_tail 0..15
    return a_shift, t_shift


@functools.partial(jax.jit, static_argnames=("a_dim", "has_transient",
                                             "dtype_name", "interpret",
                                             "n_freq_xyz", "n_freq_dir"))
def _fused_fwd(ws, inp, sx, sd, *, a_dim, has_transient, dtype_name,
               interpret, n_freq_xyz, n_freq_dir):
    dtype = jnp.dtype(dtype_name)
    n = inp.shape[0]
    grid = n // TILE_FWD
    mem = pl.ANY if interpret else pltpu.VMEM
    tile_spec = lambda: pl.BlockSpec((TILE_FWD, LANES), lambda i: (i, 0),
                                     memory_space=mem)
    const_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=mem)
    w_specs = [const_spec(s) for s in _weight_specs(has_transient)]
    e_specs = [const_spec(s) for s in _ENC_SHAPES]
    ins = [*ws, *_enc_args(a_dim, n_freq_xyz, n_freq_dir, sx, sd), inp]
    in_specs = w_specs + e_specs + [tile_spec()]
    a_shift, t_shift = _shifts(n_freq_dir, a_dim)
    kernel = functools.partial(_fwd_kernel, has_transient, dtype,
                               a_shift, t_shift, TILE_FWD)
    cp = None if interpret else pltpu.CompilerParams(
        dimension_semantics=(_os.environ.get("FUSED_MLP_FWD_SEM",
                                             "arbitrary"),))
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs,
        out_specs=tile_spec(),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        interpret=interpret,
        **({} if cp is None else {"compiler_params": cp}))(*ins)


@functools.partial(jax.jit, static_argnames=("a_dim", "has_transient",
                                             "dtype_name", "interpret",
                                             "n_freq_xyz", "n_freq_dir"))
def _fused_bwd(ws, inp, sx, sd, g, *, a_dim, has_transient, dtype_name,
               interpret, n_freq_xyz, n_freq_dir):
    dtype = jnp.dtype(dtype_name)
    n = inp.shape[0]
    grid = n // TILE
    mem = pl.ANY if interpret else pltpu.VMEM
    tile_spec = lambda: pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                     memory_space=mem)
    const_spec = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=mem)
    wshapes = _weight_specs(has_transient)
    w_specs = [const_spec(s) for s in wshapes]
    e_specs = [const_spec(s) for s in _ENC_SHAPES]
    ins = [*ws, *_enc_args(a_dim, n_freq_xyz, n_freq_dir, sx, sd), inp, g]
    in_specs = w_specs + e_specs + [tile_spec(), tile_spec()]
    out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes]
    out_specs = [const_spec(s) for s in wshapes]
    out_shape.append(jax.ShapeDtypeStruct((n, LANES), jnp.float32))
    out_specs.append(tile_spec())
    a_shift, t_shift = _shifts(n_freq_dir, a_dim)
    kernel = functools.partial(_bwd_kernel, has_transient, dtype,
                               a_shift, t_shift, TILE)
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*ins)


# ----------------------------------------------------------------------
# custom-VJP wrapper
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(params, inp, sx, sd, meta):
    out, _ = _fused_apply_fwd(params, inp, sx, sd, meta)
    return out


def _fused_apply_fwd(params, inp, sx, sd, meta):
    (a_dim, has_transient, dtype_name, interpret,
     n_freq_xyz, n_freq_dir) = meta
    ws = pack_weights(params, a_dim, has_transient, jnp.dtype(dtype_name))
    out = _fused_fwd(ws, inp, sx, sd, a_dim=a_dim,
                     has_transient=has_transient, dtype_name=dtype_name,
                     interpret=interpret, n_freq_xyz=n_freq_xyz,
                     n_freq_dir=n_freq_dir)
    return out, (params, inp, sx, sd)


def _fused_vjp_fwd(params, inp, sx, sd, meta):
    return _fused_apply_fwd(params, inp, sx, sd, meta)


def _fused_vjp_bwd(meta, res, g):
    (a_dim, has_transient, dtype_name, interpret,
     n_freq_xyz, n_freq_dir) = meta
    params, inp, sx, sd = res
    ws = pack_weights(params, a_dim, has_transient, jnp.dtype(dtype_name))
    outs = _fused_bwd(ws, inp, sx, sd, g, a_dim=a_dim,
                      has_transient=has_transient, dtype_name=dtype_name,
                      interpret=interpret, n_freq_xyz=n_freq_xyz,
                      n_freq_dir=n_freq_dir)
    nw = len(ws)
    dparams = unpack_weight_grads(outs[:nw], params, a_dim, has_transient)
    d_inp = outs[nw]
    dparams = _match_tree(params, dparams)
    # the BARF scale rows are schedule values, not parameters
    return dparams, d_inp, jnp.zeros_like(sx), jnp.zeros_like(sd)


def _match_tree(params, dparams):
    def pick(path, leaf):
        node = dparams
        try:
            for p in path:
                key = getattr(p, "key", getattr(p, "idx", None))
                node = node[key]
            return node.astype(leaf.dtype)
        except (KeyError, IndexError, TypeError):
            return jnp.zeros_like(leaf)
    return jax.tree_util.tree_map_with_path(pick, params)


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# ----------------------------------------------------------------------
# public entry
# ----------------------------------------------------------------------

def fused_apply_nerf(params, xyz, dirs, a_emb=None, t_emb=None, *,
                     output_transient: bool = False,
                     compute_dtype=jnp.bfloat16,
                     n_freq_xyz: int = 10, n_freq_dir: int = 4,
                     barf_w_xyz=None, barf_w_dir=None,
                     interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Fused PE+MLP replacement for embed + models.mlp.apply_nerf.

    Args:
      xyz: (N, 3) RAW sample positions (PE happens in-kernel).
      dirs: (N, 3) RAW per-point view directions.
      a_emb: (N, a_dim) per-point appearance embeddings (or None).
      t_emb: (N, 16) per-point transient embeddings (required when
        output_transient).
      barf_w_xyz / barf_w_dir: (N_freqs,) traced BARF annealing weights
        (core/encoding.barf_weights) or None for plain PE.

    Returns the same named-head dict as apply_nerf.
    """
    n0 = xyz.shape[0]
    a_dim = 0 if a_emb is None else a_emb.shape[-1]
    parts = [xyz, dirs]
    if a_emb is not None:
        parts.append(a_emb)
    if output_transient:
        parts.append(t_emb)
    inp = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)
    inp = jnp.pad(inp, ((0, 0), (0, LANES - inp.shape[-1])))
    _t = max(TILE, TILE_FWD)
    n = -(-n0 // _t) * _t
    if n != n0:
        inp = jnp.pad(inp, ((0, n - n0), (0, 0)))
    sx, sd = default_scale_rows(n_freq_xyz, n_freq_dir, a_dim,
                                barf_w_xyz, barf_w_dir)
    meta = (a_dim, bool(output_transient), jnp.dtype(compute_dtype).name,
            bool(interpret), int(n_freq_xyz), int(n_freq_dir))
    pre = _fused(params, inp, sx, sd, meta)[:n0]
    out = {
        "static_rgb": jax.nn.sigmoid(pre[:, COL_S_RGB:COL_S_RGB + 3]),
        "static_sigma": jax.nn.softplus(pre[:, COL_S_SIGMA]),
    }
    if output_transient:
        out["transient_rgb"] = jax.nn.sigmoid(pre[:, COL_T_RGB:COL_T_RGB + 3])
        out["transient_sigma"] = jax.nn.softplus(pre[:, COL_T_SIGMA])
        out["transient_beta"] = jax.nn.softplus(pre[:, COL_T_BETA])
    return out

"""Fused NeRF-W MLP as a Pallas TPU kernel (forward + custom VJP).

Why: the MLP dominates the train step, and XLA's layer-by-layer lowering
round-trips every (N, 256) activation through HBM — measured ~8 ms forward /
~29 ms backward for the fine pass at N=524k on v5e, right at the HBM
roofline.  This kernel runs the WHOLE network (trunk with skip, xyz_final +
sigma head, dir/rgb branch, optional 4-layer transient branch) for a tile of
sample points without leaving VMEM; the backward kernel recomputes the
forward per tile (flash-attention-style rematerialization) and accumulates
weight gradients across the sequential TPU grid.

Layout rules (see pallas_guide): every feature dim is padded to a multiple of
128 lanes; biases ride as (1, dim) rows; weight gradients are f32 VMEM
accumulators with a constant output index map (grid-sequential reduction).

Head packing: the kernel emits PRE-activation heads packed into 128-lane
blocks (static: [rgb(3) | sigma(1)], transient: [rgb(3) | sigma(1) |
beta(1)]); sigmoid/softplus run outside where XLA fuses them into the
compositor.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
TILE = int(_os.environ.get("FUSED_MLP_TILE", 512))       # bwd tile
TILE_FWD = int(_os.environ.get("FUSED_MLP_TILE_FWD", str(TILE)))
LANES = 128

# padded dims
IN_X = 128          # xyz_emb (63) -> 128
IN_D = 128          # dir(27) [+ a(48)] = 27..75 -> 128
IN_T = 128          # t_emb (16) -> 128
W_TRUNK = 256
W_HALF = 128
SKIP_IN = IN_X + W_TRUNK        # 384
FS_OUT = W_TRUNK + LANES        # xyz_final(256) | sigma col | pad -> 384
BR_IN = W_TRUNK + LANES         # xyz_final(256) + dir_a/t pad -> 384


def _pad_to(x, rows=None, cols=None):
    r = 0 if rows is None else rows - x.shape[0]
    c = 0 if cols is None else cols - x.shape[-1]
    if x.ndim == 1:
        return jnp.pad(x, (0, c))
    return jnp.pad(x, ((0, r), (0, c)))


def pack_weights(params: Dict[str, Any], a_dim: int, has_transient: bool,
                 dtype=jnp.bfloat16):
    """Pad the parameter pytree into the kernel's fixed layout.

    Returns a flat list of arrays in kernel argument order.
    """
    f32 = jnp.float32
    ws = []
    # trunk: W0 (128,256); W1-3 (256,256); W4 skip (384,256); W5-7 (256,256)
    n_xyz_in = params["xyz"][0]["w"].shape[0]  # 63 unpadded
    for i, layer in enumerate(params["xyz"]):
        if i == 0:
            w = _pad_to(layer["w"], rows=IN_X)
        elif i == 4:
            # kernel concat is [x_pad(128) | h(256)]: the x rows must land at
            # 0..n_xyz_in with a zero gap up to IN_X, then the h rows
            w = jnp.concatenate([
                _pad_to(layer["w"][:n_xyz_in], rows=IN_X),
                layer["w"][n_xyz_in:]], axis=0)
        else:
            w = layer["w"]
        ws.append(w.astype(dtype))
        ws.append(_pad_to(layer["b"].reshape(1, -1)).astype(f32))
    # fused xyz_final | static_sigma: (256, 384)
    wfs = jnp.concatenate([
        params["xyz_final"]["w"],
        _pad_to(params["static_sigma"]["w"], cols=LANES)], axis=1)
    bfs = jnp.concatenate([
        params["xyz_final"]["b"],
        _pad_to(params["static_sigma"]["b"], cols=LANES)])
    ws.append(wfs.astype(dtype))
    ws.append(bfs.reshape(1, -1).astype(f32))
    # dir branch: (384, 128) from (256 + 27 + a_dim)
    wd = params["dir"]["w"]
    wd = jnp.concatenate([
        wd[:W_TRUNK], _pad_to(wd[W_TRUNK:], rows=LANES)], axis=0)
    ws.append(wd.astype(dtype))
    ws.append(_pad_to(params["dir"]["b"].reshape(1, -1)).astype(f32))
    # static rgb head: (128, 128)
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
        # fused transient heads: [rgb(3) | sigma(1) | beta(1)] (128, 128)
        wth = jnp.concatenate(
            [tp["rgb"]["w"], tp["sigma"]["w"], tp["beta"]["w"]], axis=1)
        bth = jnp.concatenate(
            [tp["rgb"]["b"], tp["sigma"]["b"], tp["beta"]["b"]])
        ws.append(_pad_to(wth, cols=LANES).astype(dtype))
        ws.append(_pad_to(bth.reshape(1, -1), cols=LANES).astype(f32))
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
    out["static_sigma"] = {
        "w": dwfs[:, W_TRUNK:W_TRUNK + 1].astype(jnp.float32),
        "b": dbfs[0, W_TRUNK:W_TRUNK + 1].astype(jnp.float32)}
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
        tp["rgb"] = {"w": dwth[:, 0:3].astype(jnp.float32),
                     "b": dbth[0, 0:3].astype(jnp.float32)}
        tp["sigma"] = {"w": dwth[:, 3:4].astype(jnp.float32),
                       "b": dbth[0, 3:4].astype(jnp.float32)}
        tp["beta"] = {"w": dwth[:, 4:5].astype(jnp.float32),
                      "b": dbth[0, 4:5].astype(jnp.float32)}
        out["transient"] = tp
    return out


def _col_mask(n_cols: int, upto: int, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    return (iota < upto).astype(dtype)


N_TRUNK_W = 8 * 2          # (w, b) x 8
N_STATIC_W = N_TRUNK_W + 6  # + fs, dir, rgb pairs
N_TRANS_W = 5 * 2          # t0..t3 + fused heads


def _fwd_kernel(has_transient, dtype, *refs):
    """refs: [weights..., x, dira, (temb)], [out_s, (out_t)]"""
    nw = N_STATIC_W + (N_TRANS_W if has_transient else 0)
    w = refs[:nw]
    if has_transient:
        x_ref, d_ref, t_ref, os_ref, ot_ref = refs[nw:]
    else:
        x_ref, d_ref, os_ref = refs[nw:]

    def dense(a, wi, relu=True):
        y = jnp.dot(a, w[wi][:], preferred_element_type=jnp.float32)
        y = y + w[wi + 1][:]
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(dtype)

    x = x_ref[:].astype(dtype)
    h = x
    for i in range(8):
        if i == 4:
            h = jnp.concatenate([x, h], axis=-1)
        h = dense(h, 2 * i)
    fs = dense(h, 16, relu=False)                      # (T, 384)
    xyz_final = fs[:, :W_TRUNK]
    sigma = fs[:, W_TRUNK:W_TRUNK + LANES]             # col 0 is sigma
    din = jnp.concatenate([xyz_final, d_ref[:].astype(dtype)], axis=-1)
    hd = dense(din, 18)
    rgb = dense(hd, 20, relu=False)                    # (T, 128) cols 0-2
    # pack [rgb(3) | sigma(1)]
    m3 = _col_mask(LANES, 3, jnp.float32)
    os_ref[:] = (rgb.astype(jnp.float32) * m3 +
                 pltpu.roll(sigma.astype(jnp.float32) * _col_mask(
                     LANES, 1, jnp.float32), shift=3, axis=1))
    if has_transient:
        tin = jnp.concatenate([xyz_final, t_ref[:].astype(dtype)], axis=-1)
        th = dense(tin, 22)
        for k in range(3):
            th = dense(th, 24 + 2 * k)
        tout = dense(th, 30, relu=False)               # cols 0-4
        ot_ref[:] = tout.astype(jnp.float32) * _col_mask(LANES, 5, jnp.float32)


def _bwd_kernel(has_transient, dtype, *refs):
    """refs: [weights..., x, dira, (temb), g_s, (g_t)],
    outs: [dW/db..., dx, ddira, (dtemb)]"""
    nw = N_STATIC_W + (N_TRANS_W if has_transient else 0)
    w = refs[:nw]
    if has_transient:
        x_ref, d_ref, t_ref, gs_ref, gt_ref = refs[nw:nw + 5]
        outs = refs[nw + 5:]
    else:
        x_ref, d_ref, gs_ref = refs[nw:nw + 3]
        outs = refs[nw + 3:]
    dw_out = outs[:nw]
    if has_transient:
        dx_ref, dd_ref, dt_ref = outs[nw:]
    else:
        dx_ref, dd_ref = outs[nw:]

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

    def dense_fwd(a, wi, relu=True):
        y = jnp.dot(a, w[wi][:], preferred_element_type=jnp.float32)
        y = y + w[wi + 1][:]
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(dtype)

    def dense_bwd(a_in, act_out, g, wi, relu=True):
        """Returns d_a_in; accumulates dW, db.  g is f32 (T, out)."""
        if relu:
            # compare in f32 — Mosaic lacks vector bf16 cmpf on this target
            g = g * (act_out.astype(jnp.float32) > 0).astype(jnp.float32)
        gc = g.astype(dtype)
        dw = jax.lax.dot_general(
            a_in, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db = jnp.sum(g, axis=0, keepdims=True)
        acc(wi, dw, db)
        da = jax.lax.dot_general(
            gc, w[wi][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return da

    # ---- forward recompute, keeping activations live in VMEM ----
    x = x_ref[:].astype(dtype)
    acts_in, acts_out = [], []
    h = x
    for i in range(8):
        if i == 4:
            h = jnp.concatenate([x, h], axis=-1)
        acts_in.append(h)
        h = dense_fwd(h, 2 * i)
        acts_out.append(h)
    fs = dense_fwd(acts_out[7], 16, relu=False)
    xyz_final = fs[:, :W_TRUNK]
    din = jnp.concatenate([xyz_final, d_ref[:].astype(dtype)], axis=-1)
    hd = dense_fwd(din, 18)

    # ---- backward ----
    gs = gs_ref[:]                                     # (T,128) f32
    m3 = _col_mask(LANES, 3, jnp.float32)
    g_rgb = gs * m3
    g_sigma0 = pltpu.roll(gs * (jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1) == 3).astype(jnp.float32),
        shift=LANES - 3, axis=1)                       # sigma cot to col 0

    d_hd = dense_bwd(hd, None, g_rgb, 20, relu=False)
    d_din = dense_bwd(din, hd, d_hd, 18)
    d_xf = d_din[:, :W_TRUNK]
    dd_ref[:] = d_din[:, W_TRUNK:]

    if has_transient:
        tin = jnp.concatenate([xyz_final, t_ref[:].astype(dtype)], axis=-1)
        tacts = [tin]
        th = dense_fwd(tin, 22)
        tacts.append(th)
        for k in range(3):
            th = dense_fwd(th, 24 + 2 * k)
            tacts.append(th)
        gt = gt_ref[:] * _col_mask(LANES, 5, jnp.float32)
        g = dense_bwd(tacts[4], None, gt, 30, relu=False)
        for k in range(2, -1, -1):
            g = dense_bwd(tacts[k + 1], tacts[k + 2], g, 24 + 2 * k)
        d_tin = dense_bwd(tacts[0], tacts[1], g, 22)
        d_xf = d_xf + d_tin[:, :W_TRUNK]
        dt_ref[:] = d_tin[:, W_TRUNK:]

    # fs cotangent: [d_xyz_final | sigma cot in col 256]
    d_fs = jnp.concatenate([d_xf, g_sigma0], axis=-1)
    g = dense_bwd(acts_out[7], None, d_fs, 16, relu=False)
    for i in range(7, -1, -1):
        g = dense_bwd(acts_in[i], acts_out[i], g, 2 * i)
        if i == 4:
            dx_skip = g[:, :IN_X]
            g = g[:, IN_X:]
    dx_ref[:] = g + dx_skip


def _weight_specs(a_dim, has_transient, dtype):
    shapes = []
    for i in range(8):
        rows = IN_X if i == 0 else (SKIP_IN if i == 4 else W_TRUNK)
        shapes += [(rows, W_TRUNK), (1, W_TRUNK)]
    shapes += [(W_TRUNK, FS_OUT), (1, FS_OUT)]         # fused final|sigma
    shapes += [(BR_IN, W_HALF), (1, W_HALF)]           # dir
    shapes += [(W_HALF, LANES), (1, LANES)]            # rgb head
    if has_transient:
        shapes += [(BR_IN, W_HALF), (1, W_HALF)]
        shapes += [(W_HALF, W_HALF), (1, W_HALF)] * 3
        shapes += [(W_HALF, LANES), (1, LANES)]        # fused t heads
    return shapes


@functools.partial(jax.jit, static_argnames=("a_dim", "has_transient",
                                             "dtype_name", "interpret"))
def _fused_fwd(ws, x, dira, temb, *, a_dim, has_transient, dtype_name,
               interpret):
    dtype = jnp.dtype(dtype_name)
    n = x.shape[0]
    grid = n // TILE_FWD
    tile_spec = lambda: pl.BlockSpec((TILE_FWD, LANES), lambda i: (i, 0),
                                     memory_space=pltpu.ANY
                                     if interpret else pltpu.VMEM)
    w_specs = [pl.BlockSpec(s, lambda i: (0, 0),
                            memory_space=pltpu.ANY if interpret
                            else pltpu.VMEM)
               for s in _weight_specs(a_dim, has_transient, dtype)]
    ins = [*ws, x, dira] + ([temb] if has_transient else [])
    in_specs = w_specs + [tile_spec(), tile_spec()] + \
        ([tile_spec()] if has_transient else [])
    out_shape = [jax.ShapeDtypeStruct((n, LANES), jnp.float32)]
    out_specs = [tile_spec()]
    if has_transient:
        out_shape.append(jax.ShapeDtypeStruct((n, LANES), jnp.float32))
        out_specs.append(tile_spec())
    kernel = functools.partial(_fwd_kernel, has_transient, dtype)
    cp = None if interpret else pltpu.CompilerParams(
        dimension_semantics=(_os.environ.get("FUSED_MLP_FWD_SEM", "parallel"),))
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        **({} if cp is None else {"compiler_params": cp}))(*ins)


@functools.partial(jax.jit, static_argnames=("a_dim", "has_transient",
                                             "dtype_name", "interpret"))
def _fused_bwd(ws, x, dira, temb, gs, gt, *, a_dim, has_transient,
               dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    n = x.shape[0]
    grid = n // TILE
    mem = pltpu.ANY if interpret else pltpu.VMEM
    tile_spec = lambda: pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                     memory_space=mem)
    wshapes = _weight_specs(a_dim, has_transient, dtype)
    w_specs = [pl.BlockSpec(s, lambda i: (0, 0), memory_space=mem)
               for s in wshapes]
    ins = [*ws, x, dira] + ([temb] if has_transient else []) + [gs] + \
        ([gt] if has_transient else [])
    n_tiles_in = 5 if has_transient else 3  # x, dira, (temb), gs, (gt)
    in_specs = w_specs + [tile_spec() for _ in range(n_tiles_in)]
    # (w grads f32, then dx/ddira/(dtemb))
    out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in wshapes]
    out_specs = [pl.BlockSpec(s, lambda i: (0, 0), memory_space=mem)
                 for s in wshapes]
    n_dx = 3 if has_transient else 2
    out_shape += [jax.ShapeDtypeStruct((n, LANES), jnp.float32)] * n_dx
    out_specs += [tile_spec() for _ in range(n_dx)]
    kernel = functools.partial(_bwd_kernel, has_transient, dtype)
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*ins)


# ----------------------------------------------------------------------
# custom-VJP wrapper
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(params, x, dira, temb, meta):
    out = _fused_apply_fwd(params, x, dira, temb, meta)
    return out[0]


def _fused_apply_fwd(params, x, dira, temb, meta):
    a_dim, has_transient, dtype_name, interpret = meta
    ws = pack_weights(params, a_dim, has_transient, jnp.dtype(dtype_name))
    outs = _fused_fwd(ws, x, dira, temb, a_dim=a_dim,
                      has_transient=has_transient, dtype_name=dtype_name,
                      interpret=interpret)
    outs = tuple(outs) if has_transient else (outs[0], None)
    return outs, (params, x, dira, temb)


def _fused_vjp_fwd(params, x, dira, temb, meta):
    outs, res = _fused_apply_fwd(params, x, dira, temb, meta)
    return outs, res


def _fused_vjp_bwd(meta, res, g):
    a_dim, has_transient, dtype_name, interpret = meta
    params, x, dira, temb = res
    gs, gt = g
    if gt is None or not has_transient:
        gt = jnp.zeros_like(gs)
    ws = pack_weights(params, a_dim, has_transient, jnp.dtype(dtype_name))
    outs = _fused_bwd(ws, x, dira, temb, gs, gt, a_dim=a_dim,
                      has_transient=has_transient, dtype_name=dtype_name,
                      interpret=interpret)
    nw = len(ws)
    dparams = unpack_weight_grads(outs[:nw], params, a_dim, has_transient)
    if has_transient:
        dx, ddira, dtemb = outs[nw:]
    else:
        dx, ddira = outs[nw:]
        dtemb = jnp.zeros_like(temb)
    # match the params pytree: zero grads for leaves the kernel ignores
    dparams = _match_tree(params, dparams)
    return dparams, dx, ddira, dtemb


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


def _pad_cols(x, cols):
    return jnp.pad(x, ((0, 0), (0, cols - x.shape[-1])))


def fused_apply_nerf(params, xyz_emb, dir_a_emb, t_emb=None, *,
                     output_transient: bool = False,
                     compute_dtype=jnp.bfloat16,
                     interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Drop-in fused replacement for models.mlp.apply_nerf (no sigma_only).

    Pads inputs to the kernel layout, runs the fused Pallas program, applies
    the head nonlinearities, and returns the same named-head dict.
    """
    n0 = xyz_emb.shape[0]
    _t = max(TILE, TILE_FWD)
    n = -(-n0 // _t) * _t
    a_dim = dir_a_emb.shape[-1] - 27
    x = _pad_cols(xyz_emb, IN_X)
    d = _pad_cols(dir_a_emb, IN_D)
    t = _pad_cols(t_emb, IN_T) if output_transient else \
        jnp.zeros((n0, IN_T), xyz_emb.dtype)
    if n != n0:
        pad = ((0, n - n0), (0, 0))
        x, d, t = jnp.pad(x, pad), jnp.pad(d, pad), jnp.pad(t, pad)
    meta = (a_dim, bool(output_transient), jnp.dtype(compute_dtype).name,
            bool(interpret))
    s_pre, t_pre = _fused(params, x, d, t, meta)
    s_pre = s_pre[:n0]
    out = {
        "static_rgb": jax.nn.sigmoid(s_pre[:, 0:3]),
        "static_sigma": jax.nn.softplus(s_pre[:, 3]),
    }
    if output_transient:
        t_pre = t_pre[:n0]
        out["transient_rgb"] = jax.nn.sigmoid(t_pre[:, 0:3])
        out["transient_sigma"] = jax.nn.softplus(t_pre[:, 3])
        out["transient_beta"] = jax.nn.softplus(t_pre[:, 4])
    return out

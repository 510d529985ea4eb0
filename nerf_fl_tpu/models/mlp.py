"""The NeRF-W MLP as a pure function over a parameter pytree.

Architecture follows reference models/nerf.py:80-212: 8x256 xyz trunk with a
skip at layer 4, softplus static-sigma head off the trunk, a separate
no-activation ``xyz_final`` projection feeding a 128-wide dir/rgb head (which
also consumes the appearance embedding), and an optional 4x128 transient
branch with softplus/sigmoid heads.

TPU-first choices:
  * weights are stored (in, out) so every layer is a plain ``x @ w`` on the
    MXU (the reference stores torch's (out, in)),
  * all matmuls take a ``compute_dtype`` (bfloat16 on the perf path) with
    float32 accumulation via ``preferred_element_type``,
  * there is no chunk loop — callers hand the whole (N_rays*N_samples, C)
    batch to one program; memory is bounded by the caller's batch size
    (training) or fixed-shape chunk size (eval),
  * initialization reproduces torch defaults (kaiming-uniform fan_in for
    weights, uniform 1/sqrt(fan_in) for biases) so early-training loss curves
    are statistically comparable to the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class NeRFConfig:
    """Static architecture config (hashable — safe as a jit static arg).

    Mirrors the constructor args of reference nerf.py:81-86.
    """
    typ: str = "coarse"
    D: int = 8
    W: int = 256
    skips: Tuple[int, ...] = (4,)
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    encode_appearance: bool = False
    in_channels_a: int = 48
    encode_transient: bool = False
    in_channels_t: int = 16
    beta_min: float = 0.03

    def __post_init__(self):
        # The coarse model silently drops appearance/transient conditioning
        # (reference nerf.py:115-117).
        if self.typ == "coarse":
            object.__setattr__(self, "encode_appearance", False)
            object.__setattr__(self, "encode_transient", False)

    @property
    def a_dim(self) -> int:
        return self.in_channels_a if self.encode_appearance else 0


def _linear_init(rng, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nerf(rng, cfg: NeRFConfig, dtype=jnp.float32) -> Params:
    """Build the parameter pytree."""
    keys = iter(jax.random.split(rng, 32))
    p: Params = {"xyz": []}
    for i in range(cfg.D):
        fan_in = cfg.in_channels_xyz if i == 0 else (
            cfg.W + cfg.in_channels_xyz if i in cfg.skips else cfg.W)
        p["xyz"].append(_linear_init(next(keys), fan_in, cfg.W, dtype))
    p["xyz_final"] = _linear_init(next(keys), cfg.W, cfg.W, dtype)
    p["dir"] = _linear_init(
        next(keys), cfg.W + cfg.in_channels_dir + cfg.a_dim, cfg.W // 2, dtype)
    p["static_sigma"] = _linear_init(next(keys), cfg.W, 1, dtype)
    p["static_rgb"] = _linear_init(next(keys), cfg.W // 2, 3, dtype)
    if cfg.encode_transient:
        p["transient"] = {
            "layers": [
                _linear_init(next(keys), cfg.W + cfg.in_channels_t, cfg.W // 2, dtype),
                _linear_init(next(keys), cfg.W // 2, cfg.W // 2, dtype),
                _linear_init(next(keys), cfg.W // 2, cfg.W // 2, dtype),
                _linear_init(next(keys), cfg.W // 2, cfg.W // 2, dtype),
            ],
            "sigma": _linear_init(next(keys), cfg.W // 2, 1, dtype),
            "rgb": _linear_init(next(keys), cfg.W // 2, 3, dtype),
            "beta": _linear_init(next(keys), cfg.W // 2, 1, dtype),
        }
    return p


def _dense(x, layer, compute_dtype, out_dtype=None):
    """One linear layer on the MXU.

    ``out_dtype`` controls the matmul accumulator OUTPUT dtype: hidden layers
    keep bf16 activations end-to-end (otherwise the f32 cotangents force the
    backward matmuls onto the 8x-slower f32 MXU path); head layers emit f32.
    The MXU always accumulates in f32 internally.
    """
    w = layer["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w,
                preferred_element_type=out_dtype or compute_dtype)
    return y + layer["b"].astype(y.dtype)


def _dense_cat(parts, layer, compute_dtype, out_dtype=None):
    """``concat(parts, -1) @ w + b`` as per-part matmuls (row-slices of w).

    Numerically the same contraction, but the wide concat operand is never
    materialized in HBM — the b1024 trace attributes ~0.1 ms apiece to the
    (N*S, 319/331/272) concat writes and the layout copies the backward's
    transposed wgrad operands force (docs/PERF.md).  Splitting also lets the
    backward reuse one {0,1}-layout copy of a shared operand (the PE input
    feeds layer 0 AND the skip layer) instead of copying two different
    concats.
    """
    w = layer["w"].astype(compute_dtype)
    acc = None
    lo = 0
    for p in parts:
        hi = lo + p.shape[-1]
        y = jnp.dot(p.astype(compute_dtype), w[lo:hi],
                    preferred_element_type=out_dtype or compute_dtype)
        acc = y if acc is None else acc + y
        lo = hi
    return acc + layer["b"].astype(acc.dtype)


def _dense_ray_cond(x_sample, x_ray, samples_per_ray, layer, compute_dtype,
                    out_dtype=None):
    """``concat([x_sample, broadcast(x_ray)], -1) @ w + b`` without ever
    broadcasting the per-ray conditioning to samples.

    x_sample is (N*S, C_s); x_ray is per-RAY (N, C_r), constant over a ray's
    S samples (the reference broadcasts it to every sample,
    rendering.py:113-118).  Contracting the per-ray block per ray —
    ``(N, C_r) @ w_r`` — and broadcast-ADDING the (N, out) result is the same
    sum, but replaces a (N*S, C_r) HBM materialization + matmul operand +
    backward layout copy with a negligible (N, C_r) matmul; the backward of
    the broadcast-add is the sample-sum reduction XLA derives for free.
    """
    w = layer["w"].astype(compute_dtype)
    cs = x_sample.shape[-1]
    y_s = jnp.dot(x_sample.astype(compute_dtype), w[:cs],
                  preferred_element_type=out_dtype or compute_dtype)
    y_r = jnp.dot(x_ray.astype(compute_dtype), w[cs:],
                  preferred_element_type=out_dtype or compute_dtype)
    y_r = y_r + layer["b"].astype(y_r.dtype)
    n = x_ray.shape[0]
    out = y_s.reshape(n, samples_per_ray, -1) + y_r[:, None, :]
    return out.reshape(n * samples_per_ray, -1)


def apply_nerf(params: Params, cfg: NeRFConfig, xyz_emb: jnp.ndarray,
               dir_a_emb: Optional[jnp.ndarray] = None,
               t_emb: Optional[jnp.ndarray] = None, *,
               sigma_only: bool = False, output_transient: bool = False,
               compute_dtype=jnp.float32,
               samples_per_ray: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Forward pass (reference nerf.py:153-212), returning named heads instead
    of a concatenated channel layout.

    Args:
      xyz_emb: (B, in_channels_xyz) positional-encoded samples.
      dir_a_emb: (B, in_channels_dir [+ in_channels_a]) encoded view dirs,
        with the appearance embedding already concatenated when enabled —
        OR, when ``samples_per_ray`` is set, the per-RAY (B/samples_per_ray,
        C) array before broadcasting (the broadcast then never reaches HBM;
        see _dense_ray_cond).
      t_emb: (B, in_channels_t) transient embedding (required when
        output_transient); per-ray like dir_a_emb when ``samples_per_ray``.
      samples_per_ray: if set, dir_a_emb/t_emb are per-ray and B =
        n_rays * samples_per_ray.

    Returns dict with keys among:
      static_sigma (B,), static_rgb (B, 3),
      transient_sigma (B,), transient_rgb (B, 3), transient_beta (B,).
    """
    xyz_c = xyz_emb.astype(compute_dtype)
    h = xyz_c
    for i, layer in enumerate(params["xyz"]):
        if i in cfg.skips:
            h = _dense_cat([xyz_c, h], layer, compute_dtype)
        else:
            h = _dense(h, layer, compute_dtype)
        h = jax.nn.relu(h)

    static_sigma = jax.nn.softplus(
        _dense(h, params["static_sigma"], compute_dtype,
               out_dtype=jnp.float32))[..., 0]
    out = {"static_sigma": static_sigma}
    if sigma_only:
        return out

    xyz_final = _dense(h, params["xyz_final"], compute_dtype)
    if samples_per_ray is None:
        dir_h = jax.nn.relu(_dense_cat([xyz_final, dir_a_emb],
                                       params["dir"], compute_dtype))
    else:
        dir_h = jax.nn.relu(_dense_ray_cond(
            xyz_final, dir_a_emb, samples_per_ray, params["dir"],
            compute_dtype))
    out["static_rgb"] = jax.nn.sigmoid(
        _dense(dir_h, params["static_rgb"], compute_dtype,
               out_dtype=jnp.float32))

    if not output_transient:
        return out

    tp = params["transient"]
    first, rest = tp["layers"][0], tp["layers"][1:]
    if samples_per_ray is None:
        th = jax.nn.relu(_dense_cat([xyz_final, t_emb], first, compute_dtype))
    else:
        th = jax.nn.relu(_dense_ray_cond(
            xyz_final, t_emb, samples_per_ray, first, compute_dtype))
    for layer in rest:
        th = jax.nn.relu(_dense(th, layer, compute_dtype))
    out["transient_sigma"] = jax.nn.softplus(
        _dense(th, tp["sigma"], compute_dtype, out_dtype=jnp.float32))[..., 0]
    out["transient_rgb"] = jax.nn.sigmoid(
        _dense(th, tp["rgb"], compute_dtype, out_dtype=jnp.float32))
    out["transient_beta"] = jax.nn.softplus(
        _dense(th, tp["beta"], compute_dtype, out_dtype=jnp.float32))[..., 0]
    return out


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))

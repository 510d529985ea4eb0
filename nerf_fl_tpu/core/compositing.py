"""Alpha compositing for static / static+transient radiance fields.

Semantics follow reference models/rendering.py:142-226 exactly, including its
deliberate divergences from the NeRF-W paper:
  * terminal bin delta is 1e2, not inf (rendering.py:143),
  * sigma noise regularizer only on the no-transient path (rendering.py:151),
  * beta_min is added AFTER compositing beta (rendering.py:182-185),
  * white-background blending uses the COMBINED opacity even for the
    static-only decomposition map (rendering.py:177, 204).

Everything is expressed as cumulative products / weighted reductions over the
sample axis — XLA fuses this into the tail of the MLP output on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

DELTA_INF = 1e2


class StaticComposite(NamedTuple):
    rgb: jnp.ndarray        # (N, 3)
    depth: jnp.ndarray      # (N,)
    weights: jnp.ndarray    # (N, S)
    opacity: jnp.ndarray    # (N,)


class TransientComposite(NamedTuple):
    rgb: jnp.ndarray              # (N, 3) combined static+transient
    depth: jnp.ndarray            # (N,)
    weights: jnp.ndarray          # (N, S) combined weights
    opacity: jnp.ndarray          # (N,)
    beta: jnp.ndarray             # (N,) composited uncertainty (+beta_min)
    static_rgb: jnp.ndarray       # (N, 3) static part under shared transmittance
    transient_rgb: jnp.ndarray    # (N, 3) transient part under shared transmittance


def ray_deltas(z_vals: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample distances with the 1e2 terminal bin (rendering.py:142-144)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    inf = jnp.full_like(deltas[:, :1], DELTA_INF)
    return jnp.concatenate([deltas, inf], axis=-1)


def exclusive_transmittance(alphas: jnp.ndarray) -> jnp.ndarray:
    """T_i = prod_{j<i} (1 - a_j), i.e. [1, 1-a1, (1-a1)(1-a2), ...]
    (rendering.py:154-156)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]], axis=-1)
    return jnp.cumprod(shifted, axis=-1)


def composite_static(z_vals: jnp.ndarray, rgbs: Optional[jnp.ndarray],
                     sigmas: jnp.ndarray, *, noise_rng=None,
                     noise_std: float = 0.0, white_back: bool = False,
                     weights_only: bool = False) -> StaticComposite:
    """Static-only compositing (reference rendering.py:150-163, 218-226).

    ``weights_only`` corresponds to the coarse model at test time
    (rendering.py:169-170): rgbs may be None and only weights/opacity are
    meaningful.
    """
    deltas = ray_deltas(z_vals)
    sig = sigmas
    if noise_std > 0 and noise_rng is not None:
        sig = sig + jax.random.normal(noise_rng, sig.shape, sig.dtype) * noise_std
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sig))
    weights = alphas * exclusive_transmittance(alphas)
    opacity = jnp.sum(weights, axis=-1)
    if weights_only:
        z = jnp.zeros_like(opacity)
        return StaticComposite(jnp.zeros(z_vals.shape[:1] + (3,), z_vals.dtype),
                               z, weights, opacity)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    if white_back:
        rgb = rgb + (1.0 - opacity[..., None])
    depth = jnp.sum(weights * z_vals, axis=-1)
    return StaticComposite(rgb, depth, weights, opacity)


def composite_transient(z_vals, static_rgbs, static_sigmas, transient_rgbs,
                        transient_sigmas, transient_betas, *, beta_min: float,
                        white_back: bool = False) -> TransientComposite:
    """Static+transient compositing under a shared transmittance
    (reference rendering.py:146-190).  No sigma noise on this path, and relu
    is NOT applied (sigmas come from softplus heads, already positive)."""
    deltas = ray_deltas(z_vals)
    static_alphas = 1.0 - jnp.exp(-deltas * static_sigmas)
    transient_alphas = 1.0 - jnp.exp(-deltas * transient_sigmas)
    alphas = 1.0 - jnp.exp(-deltas * (static_sigmas + transient_sigmas))

    transmittance = exclusive_transmittance(alphas)
    static_weights = static_alphas * transmittance
    transient_weights = transient_alphas * transmittance
    weights = alphas * transmittance
    opacity = jnp.sum(weights, axis=-1)

    static_rgb = jnp.sum(static_weights[..., None] * static_rgbs, axis=-2)
    if white_back:
        # NOTE: combined opacity, by reference design (rendering.py:176-177)
        static_rgb = static_rgb + (1.0 - opacity[..., None])
    transient_rgb = jnp.sum(transient_weights[..., None] * transient_rgbs, axis=-2)

    beta = jnp.sum(transient_weights * transient_betas, axis=-1) + beta_min
    depth = jnp.sum(weights * z_vals, axis=-1)

    return TransientComposite(static_rgb + transient_rgb, depth, weights,
                              opacity, beta, static_rgb, transient_rgb)


def composite_solo_field(z_vals, rgbs, sigmas, *, white_back: bool = False,
                         combined_opacity: Optional[jnp.ndarray] = None):
    """Test-time decomposition: re-composite one field as if it existed alone,
    with its OWN transmittance (reference rendering.py:192-217).

    ``combined_opacity`` feeds the white-background blend, which the reference
    (quirkily) takes from the combined render (rendering.py:203-204).

    Returns (rgb_map, depth_map).
    """
    deltas = ray_deltas(z_vals)
    alphas = 1.0 - jnp.exp(-deltas * sigmas)
    weights = alphas * exclusive_transmittance(alphas)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    if white_back and combined_opacity is not None:
        rgb = rgb + (1.0 - combined_opacity[..., None])
    depth = jnp.sum(weights * z_vals, axis=-1)
    return rgb, depth

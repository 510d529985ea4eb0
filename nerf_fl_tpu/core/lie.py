"""Batched so(3)/SE(3) helpers for learned pose refinement (BARF).

Semantics follow reference utils/lie_group_helper.py:29-84, but everything is
batched and vectorized: the reference builds one 4x4 per camera in a Python
loop; here ``exp_so3``/``make_c2w`` map over a leading batch axis in a single
XLA program so per-ray pose gathers stay on device.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def vec2skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices (lie_group_helper.py:50-60)."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zero], -1),
    ]
    return jnp.stack(rows, -2)


def exp_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map so(3) -> SO(3), batched over leading dims.

    Matches lie_group_helper.py:63-72 including its ``norm + 1e-15``
    regularization at the origin.
    """
    skew = vec2skew(r)
    # Pose deltas INIT at exactly zero, and sin(x)/x, (1-cos(x))/x^2 have
    # removable singularities there whose naive autodiff is NaN.  Standard
    # double-where guard: small-angle branch uses Taylor forms, and the large
    # branch divides by a value clamped away from zero so neither branch's
    # gradient can produce NaN.
    sq = jnp.sum(r * r, axis=-1, keepdims=True)[..., None]
    small = sq < 1e-9
    safe_sq = jnp.where(small, 1.0, sq)
    norm = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(norm) / norm)
    B = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(norm)) / safe_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    return eye + A * skew + B * (skew @ skew)


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle + (..., 3) translation -> (..., 4, 4) pose
    (lie_group_helper.py:75-84)."""
    R = exp_so3(r)
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    return convert3x4_4x4(top)


def convert3x4_4x4(m: jnp.ndarray) -> jnp.ndarray:
    """Pad (..., 3, 4) -> (..., 4, 4) with [0, 0, 0, 1] (lie_group_helper.py:29-47)."""
    bottom = jnp.zeros_like(m[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([m, bottom], axis=-2)


def convert3x4_4x4_np(m: np.ndarray) -> np.ndarray:
    """NumPy twin for host-side pose prep."""
    if m.ndim == 3:
        bottom = np.zeros_like(m[:, :1])
        bottom[:, 0, 3] = 1.0
        return np.concatenate([m, bottom], axis=1)
    bottom = np.array([[0, 0, 0, 1]], dtype=m.dtype)
    return np.concatenate([m, bottom], axis=0)

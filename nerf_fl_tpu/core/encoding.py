"""Sinusoidal positional encoding with optional BARF coarse-to-fine annealing.

Semantics follow reference models/nerf.py:6-77.  The reference builds the
embedding with a Python loop ``[x] + [sin(f x), cos(f x) for f in freqs]``;
here the whole encoding is one vectorized outer product so XLA sees a single
fused elementwise program, and the channel *order* matches the reference
exactly: ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]`` where each
sin/cos block spans the 3 input channels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = float(np.pi)

# minimax odd polynomial for sin(2*pi*u) on u in [-0.5, 0.5]
_SIN2PI = (6.2831834654095857, -41.341480259587343, 81.597655247118169,
           -76.594899673933057, 41.269796373562237, -12.37227202917199)
_INV_2PI = 0.15915494309189535
# Cody-Waite split of 2*pi: HI has a 12-bit mantissa so n*HI (n <= ~2^10)
# is exact in f32 and x - n*HI cancels without error
_TWO_PI_HI = 6.28125
_TWO_PI_LO = 0.0019353071795864769


def sin_cw(x, quarter_turns=0.0):
    """sin(x + 2*pi*quarter_turns) via Cody-Waite range reduction + odd
    polynomial — ~3x cheaper than the libm-grade XLA lowering on the TPU
    VPU (measured: jnp.sin costs ~3 ms per (524k, 128) f32 pass).

    The phase offset is applied AFTER reduction, in turn units, where it is
    exact — adding pi/2 to a large f32 argument would round the phase into
    the argument's ulp grid (1e-4 at |x|~3000), which the x512 frequency
    amplification of the xyz-PE backward turns into visible gradient error.
    The two-constant reduction keeps the result within ~1e-6 of exact f32
    sin/cos for |x| up to ~2^13 (the PE argument range: 2^9 * scene
    coords).  Autodiff produces the polynomial's own derivative (round()
    contributes zero), which approximates the true cosine to the same
    accuracy."""
    n = jnp.round(x * _INV_2PI)
    r = x - n * _TWO_PI_HI
    r = r - n * _TWO_PI_LO
    u = r * _INV_2PI + quarter_turns
    u = u - jnp.round(u)  # [-0.5, 0.5]
    u2 = u * u
    p = _SIN2PI[5]
    for k in (4, 3, 2, 1, 0):
        p = p * u2 + _SIN2PI[k]
    return p * u


def fast_sin(x):
    return sin_cw(x)


def fast_cos(x):
    return sin_cw(x, 0.25)


def posenc_freqs(max_logscale: int, N_freqs: int, logscale: bool = True) -> np.ndarray:
    """Frequency ladder. Matches reference nerf.py:14-17."""
    if logscale:
        return 2.0 ** np.linspace(0, max_logscale, N_freqs, dtype=np.float64)
    return np.linspace(1, 2.0 ** max_logscale, N_freqs, dtype=np.float64)


def posenc(x: jnp.ndarray, N_freqs: int, *, max_logscale: int | None = None,
           logscale: bool = True, weights: jnp.ndarray | None = None,
           fast: bool = False) -> jnp.ndarray:
    """Embed ``x`` (..., C) -> (..., C * (1 + 2*N_freqs)).

    ``weights`` (N_freqs,) optionally scales each frequency's sin/cos block —
    this is the BARF annealing hook (reference nerf.py:61-77 multiplies each
    block by a per-frequency weight, identity channels left untouched).

    ``fast`` uses the Cody-Waite polynomial trig (error ~1e-6 vs exact f32,
    far below bf16 resolution) — enabled on the bf16 compute path, where the
    libm-grade sin/cos lowering is measurably VPU-bound.
    """
    if max_logscale is None:
        max_logscale = N_freqs - 1
    freqs = jnp.asarray(posenc_freqs(max_logscale, N_freqs, logscale), x.dtype)
    # (..., 1, C) * (F, 1) -> (..., F, C)
    xb = x[..., None, :] * freqs[:, None]
    if fast:
        sin, cos = fast_sin(xb), fast_cos(xb)
    else:
        sin, cos = jnp.sin(xb), jnp.cos(xb)
    if weights is not None:
        w = weights.astype(x.dtype)[:, None]
        sin, cos = sin * w, cos * w
    # interleave per-frequency [sin_f, cos_f] blocks, each of width C
    sc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * N_freqs * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)


def barf_alpha(epoch, N_freqs: int, epoch_start: int, epoch_end: int,
               schedule: str = "fork"):
    """BARF annealing progress.  ``epoch`` may be a traced scalar.

    schedule="fork" matches the reference's (unusual) rule at nerf.py:47-52:
    alpha = N_freqs/epoch inside (start, end], N_freqs after end, 0 before.
    schedule="paper" is BARF eq. 14: alpha ramps linearly 0 -> N_freqs over
    [start, end] in epoch units.
    """
    epoch = jnp.asarray(epoch, jnp.float32)
    if schedule == "paper":
        prog = jnp.clip((epoch - epoch_start)
                        / max(epoch_end - epoch_start, 1e-8), 0.0, 1.0)
        return prog * float(N_freqs)
    mid = N_freqs / jnp.maximum(epoch, 1e-8)
    return jnp.where(
        epoch > epoch_end,
        float(N_freqs),
        jnp.where(epoch > epoch_start, mid, 0.0),
    )


def barf_weights(epoch, N_freqs: int, epoch_start: int, epoch_end: int,
                 *, max_logscale: int | None = None, logscale: bool = True,
                 schedule: str = "fork"):
    """Per-frequency annealing weights.

    schedule="fork" reproduces reference nerf.py:47-59 exactly, including
    its two quirks: alpha = N_freqs/epoch (DECREASING inside the window)
    and comparison of alpha against the frequency *value* 2^k rather than
    the index k.  Because max(alpha) = N_freqs while the top xyz frequency
    is 2^(N_freqs-1), every band with 2^k >= N_freqs is zeroed FOREVER
    (for the default N_emb_xyz=10: bands 4..9 never activate) — the
    reference's --refine_pose field is permanently low-pass filtered,
    which is why it ships with no recovery demonstration.

    schedule="paper" is the actual BARF coarse-to-fine rule (eq. 14):
    alpha ramps 0 -> N_freqs linearly over [epoch_start, epoch_end] and is
    compared against the frequency INDEX k, so every band is fully active
    from epoch_end on.  Selected via --barf_schedule paper; the fork rule
    stays the default for reference parity.
    """
    if max_logscale is None:
        max_logscale = N_freqs - 1
    if schedule == "paper":
        freqs = jnp.arange(N_freqs, dtype=jnp.float32)
    else:
        freqs = jnp.asarray(posenc_freqs(max_logscale, N_freqs, logscale),
                            jnp.float32)
    alpha = barf_alpha(epoch, N_freqs, epoch_start, epoch_end, schedule)
    d = alpha - freqs
    ramp = (1.0 - jnp.cos(d * PI)) / 2.0
    return jnp.where(d < 0.0, 0.0, jnp.where(d < 1.0, ramp, 1.0))


def embed(x: jnp.ndarray, N_freqs: int, *, barf: bool = False, epoch=None,
          epoch_start: int = 4, epoch_end: int = 8,
          max_logscale: int | None = None, logscale: bool = True,
          fast: bool = False, schedule: str = "fork") -> jnp.ndarray:
    """PosEmbedding / BarfPosEmbedding forward in one entry point.

    The reference hardcodes BARF epochs (4, 8) at train.py:43-44; they are
    parameters here with the same defaults.
    """
    w = None
    if barf:
        if epoch is None:
            raise ValueError("BARF embedding requires `epoch`")
        w = barf_weights(epoch, N_freqs, epoch_start, epoch_end,
                         max_logscale=max_logscale, logscale=logscale,
                         schedule=schedule)
    return posenc(x, N_freqs, max_logscale=max_logscale, logscale=logscale,
                  weights=w, fast=fast)


def posenc_dim(C: int, N_freqs: int) -> int:
    return C * (1 + 2 * N_freqs)

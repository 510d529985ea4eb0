"""Test-time appearance optimization (NeRF-W paper sec. 4 eval protocol).

Held-out images carry appearance ids whose embedding rows were never
trained, so NeRF-A/W scores on unseen views are limited by a random
48-vector.  The paper's protocol fits that single embedding to HALF of
the held-out image (model weights frozen) and scores the OTHER half —
the appearance vector cannot memorize pixels it was never fit on.

The reference repo has no equivalent (its notebooks reuse train-image
embeddings).  Here it is one jitted lax.scan of Adam steps over the
(N_a,) vector — the whole fit is a single device dispatch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from .renderer import RenderConfig, render_rays


@functools.lru_cache(maxsize=8)
def _fit_fn(cfg: RenderConfig, steps: int, lr: float):
    cfg = cfg.eval_variant()  # deterministic sampling while fitting
    tx = optax.adam(lr)

    def run(params, rays, ts, rgbs, a0, rng):
        n = rays.shape[0]

        def loss_fn(a):
            res = render_rays(
                params, rays, ts, rng, cfg,
                a_embedded=jnp.broadcast_to(a, (n, a.shape[-1])),
                output_transient=False)
            typ = "fine" if cfg.N_importance > 0 else "coarse"
            return jnp.mean((res[f"rgb_{typ}"] - rgbs) ** 2)

        def body(carry, _):
            a, opt = carry
            loss, g = jax.value_and_grad(loss_fn)(a)
            updates, opt = tx.update(g, opt)
            return (optax.apply_updates(a, updates), opt), loss

        (a, _), losses = jax.lax.scan(
            body, (a0, tx.init(a0)), None, length=steps)
        return a, losses

    return jax.jit(run)


def optimize_appearance(params, rays, ts, rgbs, cfg: RenderConfig, *,
                        steps: int = 100, lr: float = 0.1,
                        rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit one appearance embedding to (rays, rgbs) with frozen weights.

    Returns (optimized (N_a,) vector, per-step loss curve).  Start point is
    the id's existing embedding row, so zero steps reproduces the
    unoptimized render.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    a0 = jnp.asarray(params["embedding_a"])[int(ts[0])]
    fit = _fit_fn(cfg, int(steps), float(lr))
    return fit(params, jnp.asarray(rays), jnp.asarray(ts),
               jnp.asarray(rgbs), a0, rng)

"""Optimizer / LR-schedule factories (optax).

Mirrors reference utils/__init__.py:24-61 and utils/warmup_scheduler.py:
  * optimizers: sgd / adam / radam / ranger, eps=1e-8, torch-style additive
    weight decay,
  * schedulers stepped PER EPOCH (Lightning semantics): steplr (MultiStepLR),
    cosine (CosineAnnealingLR, eta_min=1e-8), poly, each optionally wrapped
    in a linear warmup over ``warmup_epochs`` (skipped for radam/ranger,
    reference utils/__init__.py:57).

The TPU-native shape: the schedule is a pure host function epoch -> lr, and
the learning rate enters the jitted train step as a traced scalar, so one
compiled step serves the whole run.  Non-trainable leaves (frozen pose init,
pose deltas when --refine_pose is off) are masked out of the update.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_for_epoch(hparams, epoch: int) -> float:
    """Learning rate for a (0-indexed) epoch.

    Matches torch per-epoch scheduler semantics used by the reference:
    MultiStepLR / CosineAnnealingLR / poly-LambdaLR + GradualWarmupScheduler.
    """
    lr0 = hparams.lr
    eps = 1e-8
    warmup = getattr(hparams, "warmup_epochs", 0)
    mult = getattr(hparams, "warmup_multiplier", 1.0)
    use_warmup = warmup > 0 and hparams.optimizer not in ("radam", "ranger")

    if use_warmup and epoch <= warmup:
        return lr0 * ((mult - 1.0) * epoch / warmup + 1.0)
    base = lr0 * mult if use_warmup else lr0
    e = epoch - warmup if use_warmup else epoch

    if hparams.lr_scheduler == "steplr":
        n = sum(1 for m in hparams.decay_step if e >= m)
        return base * hparams.decay_gamma**n
    if hparams.lr_scheduler == "cosine":
        return eps + (base - eps) * (1 + math.cos(math.pi * e / hparams.num_epochs)) / 2
    if hparams.lr_scheduler == "poly":
        return base * (1 - e / hparams.num_epochs) ** hparams.poly_exp
    raise ValueError(f"scheduler not recognized: {hparams.lr_scheduler}")


def scale_by_radam_torch(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8, threshold: float = 5.0,
                         strict: bool = False) -> optax.GradientTransformation:
    """RAdam rescaling in torch_optimizer's exact arithmetic (radam.py /
    pytorch_ranger's ranger.py — the optimizers reference
    utils/__init__.py:34-39 builds).

    Differs from optax.scale_by_radam in where eps sits: torch divides by
    ``sqrt(nu) + eps`` and folds the ``sqrt(1 - b2^t)`` bias correction into
    the step size, so the effective eps is ``eps / sqrt(1 - b2^t)`` — up to
    ~32x larger in early steps — while optax divides by
    ``sqrt(nu_hat) + eps``.  ``strict`` selects the rectification test:
    torch_optimizer.RAdam rectifies when rho >= threshold, pytorch_ranger
    when rho > threshold (measure-zero apart, kept for exactness).
    Below threshold both degenerate to bias-corrected momentum SGD.
    """
    ro_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=zeros,
                                      nu=jax.tree_util.tree_map(
                                          jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        t = state.count + 1
        # weakly-typed exponent: resolves to the params' working precision
        # (f32 in production, f64 under the x64 oracle tests)
        b2t = b2 ** (t * 1.0)
        b1t = b1 ** (t * 1.0)
        ro = ro_inf - 2.0 * t * b2t / (1.0 - b2t)
        rect = ro > threshold if strict else ro >= threshold
        # torch folds sqrt(1-b2t) and the rectification factor into the
        # step size; the unused branch's sqrt argument is clamped >= 0
        # (ro < 4 early on) so no NaN leaks through the where
        r = jnp.sqrt(jnp.maximum(
            (1.0 - b2t) * (ro - 4.0) * (ro - 2.0) * ro_inf
            / ((ro_inf - 4.0) * (ro_inf - 2.0) * ro), 0.0))
        new_updates = jax.tree_util.tree_map(
            lambda m, v: jnp.where(
                rect,
                (r / (1.0 - b1t)).astype(m.dtype) * m
                / (jnp.sqrt(v) + eps),
                m / (1.0 - b1t).astype(m.dtype)),
            mu, nu)
        return new_updates, optax.ScaleByAdamState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def centralize_gradients() -> optax.GradientTransformation:
    """Gradient centralization, on by default inside pytorch_ranger's Ranger
    (use_gc=True, gc_conv_only=False): every >= 2-D gradient has its
    per-output-unit mean subtracted.  torch stores Linear weights (out, in)
    and centralizes over dims 1..; our dense kernels are (in, out)
    (models/mlp.py:_linear_init), so for ``w`` leaves the equivalent
    reduction runs over the fan-in axis 0.  Other >= 2-D leaves (embedding
    tables (V, D), pose deltas (N, 3)) share torch's layout, so the mean
    runs over dims 1.. as torch does."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def gc(path, g):
            if g.ndim < 2:
                return g
            keys = [getattr(p, "key", None) for p in path]
            if keys and keys[-1] == "w":
                return g - jnp.mean(g, axis=0, keepdims=True)
            return g - jnp.mean(g, axis=tuple(range(1, g.ndim)),
                                keepdims=True)

        return jax.tree_util.tree_map_with_path(gc, updates), state

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    slow: Any
    count: jnp.ndarray


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (Ranger = RAdam + Lookahead), operating on FINAL
    post-lr parameter deltas: every k steps the slow weights absorb alpha of
    the fast-weight excursion and the fast weights snap back
    (pytorch_ranger ranger.py's slow_buffer sync).

    Lookahead cannot live inside the pre-lr chain: the sync delta is
    ``slow_new - p``, which depends on the actual fast weights ``p + delta``
    — with the scheduled lr applied — not on the unscaled direction.  (The
    round-3 version made exactly that mistake; the NumPy lockstep oracle in
    tests/test_optimizers.py now pins the corrected composition.)
    """

    def init(params):
        return LookaheadState(jax.tree_util.tree_map(jnp.asarray, params),
                              jnp.zeros([], jnp.int32))

    def update(deltas, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % k) == 0
        fast = jax.tree_util.tree_map(lambda p, d: p + d, params, deltas)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
            state.slow, fast)
        new_deltas = jax.tree_util.tree_map(
            lambda p, d, s: jnp.where(sync, s - p, d), params, deltas,
            new_slow)
        return new_deltas, LookaheadState(new_slow, count)

    return optax.GradientTransformation(init, update)


class Optimizer(NamedTuple):
    """lr-aware optimizer: ``update(grads, state, params, lr)`` returns the
    FINAL parameter deltas (descent direction already scaled by ``-lr``) so
    post-lr transformations (lookahead) compose correctly.  The lr stays a
    traced scalar — one compiled train step serves the whole schedule."""
    init: Any
    update: Any


def build_optimizer(hparams) -> Optimizer:
    """Optimizer matching reference utils/__init__.py:24-42.

    The scheduled learning rate is a per-step argument to ``update``;
    callers apply the returned deltas with ``optax.apply_updates``.
    """
    eps = 1e-8
    wd = getattr(hparams, "weight_decay", 0.0)
    name = hparams.optimizer

    chain = []
    if name == "sgd":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        if getattr(hparams, "momentum", 0.0) > 0:
            chain.append(optax.trace(decay=hparams.momentum))
    elif name == "adam":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(eps=eps))
    elif name == "radam":
        chain.append(scale_by_radam_torch(eps=eps))
        if wd > 0:
            # torch_optimizer.RAdam applies weight decay DECOUPLED (straight
            # onto params, scaled by lr: p.add_(p, alpha=-wd*lr)), unlike
            # torch.optim.Adam's L2-into-grad — so it composes AFTER the
            # moment rescaling (oracle-tested, tests/test_optimizers.py)
            chain.append(optax.add_decayed_weights(wd))
    elif name == "ranger":
        # pytorch_ranger defaults: betas=(0.95, 0.999), k=6, alpha=0.5,
        # use_gc=True, strict rho > 5 rectification test, decoupled wd
        chain.append(centralize_gradients())
        chain.append(scale_by_radam_torch(b1=0.95, eps=eps, strict=True))
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
    else:
        raise ValueError(f"optimizer not recognized: {name}")

    inner = optax.chain(*chain) if chain else optax.identity()
    post = lookahead() if name == "ranger" else None

    def init(params):
        if post is None:
            return inner.init(params)
        return (inner.init(params), post.init(params))

    def update(grads, state, params, lr):
        inner_state = state[0] if post is not None else state
        u, inner_state = inner.update(grads, inner_state, params)
        deltas = jax.tree_util.tree_map(lambda x: -lr * x, u)
        if post is None:
            return deltas, inner_state
        deltas, post_state = post.update(deltas, state[1], params)
        return deltas, (inner_state, post_state)

    return Optimizer(init, update)


def mask_updates(updates, mask):
    """Zero updates for frozen leaves (mask: True = trainable, static bools)."""
    return jax.tree_util.tree_map(
        lambda u, m: u if m else jnp.zeros_like(u), updates, mask)


def make_trainable_mask(params, refine_pose: bool):
    """True = trainable.  Freezes learn_poses.init_c2w always, and the pose
    deltas r/t unless --refine_pose (reference poses.py:21-24)."""

    def mask_path(path, _leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "learn_poses" in keys:
            if "init_c2w" in keys:
                return False
            return refine_pose
        return True

    return jax.tree_util.tree_map_with_path(mask_path, params)


def get_parameters_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))

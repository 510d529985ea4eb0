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


class LookaheadState(NamedTuple):
    slow: Any
    count: jnp.ndarray


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (Ranger = RAdam + Lookahead).  Implemented as a
    params-aware transformation: every k steps the slow weights absorb
    alpha of the fast-weight excursion and the fast weights snap back."""

    def init(params):
        return LookaheadState(jax.tree_util.tree_map(jnp.asarray, params),
                              jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % k) == 0
        fast = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
            state.slow, fast)
        new_updates = jax.tree_util.tree_map(
            lambda p, u, s: jnp.where(sync, s - p, u), params, updates, new_slow)
        return new_updates, LookaheadState(new_slow, count)

    return optax.GradientTransformation(init, update)


def build_optimizer(hparams) -> optax.GradientTransformation:
    """Optimizer matching reference utils/__init__.py:24-42.

    The learning rate is injected per step via ``optax.scale(-1)`` plus an
    external multiply — see ``apply_lr`` — so we expose the raw direction
    here and the train step scales by the scheduled lr.
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
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_radam(eps=eps))
    elif name == "ranger":
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        # torch_optimizer.Ranger defaults: betas=(0.95, 0.999), k=6, alpha=0.5
        chain.append(optax.scale_by_radam(b1=0.95, eps=eps))
        chain.append(lookahead())
    else:
        raise ValueError(f"optimizer not recognized: {name}")

    return optax.chain(*chain) if chain else optax.identity()


def scale_updates_by_lr(updates, lr):
    """Direction -> step: multiply by the scheduled lr (negated for descent)."""
    return jax.tree_util.tree_map(lambda u: -lr * u, updates)


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

"""Per-image appearance / transient embedding tables.

The reference uses ``torch.nn.Embedding(N_vocab, dim)`` (train.py:51-58).
Here the table is a plain (N_vocab, dim) array; lookup is a ``jnp.take`` that
XLA lowers to a dynamic-gather feeding the MLP's concat — no separate kernel.

The reference's documented failure mode (CUDA device-side assert when an image
id >= N_vocab, README.md:124) is replaced by an explicit host-side validation
helper used at dataset-setup time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_embedding(rng, n_vocab: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(rng, (n_vocab, dim), dtype)


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """(V, D) table gathered at integer ids (...,) -> (..., D)."""
    return jnp.take(table, ids, axis=0)


def validate_vocab(n_vocab: int, max_id: int, what: str = "ts") -> None:
    """Startup guard replacing the reference's runtime device assert."""
    if max_id >= n_vocab:
        raise ValueError(
            f"--N_vocab={n_vocab} is too small: max {what} id in the dataset is "
            f"{max_id}. Increase --N_vocab to at least {max_id + 1}.")

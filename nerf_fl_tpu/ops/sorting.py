"""TPU-friendly replacements for sort / gather in the sampling hot path.

XLA's per-row sort and gather lower poorly on TPU for NeRF's shapes
(thousands of rows x 64-128 lanes): measured ~12 ms per train step at
B=4096 just for sample_pdf + z-merge.  Every primitive here is expressed as
dense compare-counts and one-hot contractions — pure VPU/MXU work with no
data-dependent memory access:

  * rank-based merge of two per-row SORTED arrays (the coarse/fine z merge:
    both inputs are already sorted, so a full sort is wasted work),
  * one-hot gather (rows gather at per-row integer indices),
  * order-statistics uniform sampling (directly generates SORTED uniforms
    via normalized exponential spacings, removing the need to sort the
    stochastic importance samples).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_gather(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values (N, K) gathered at idx (N, Q) -> (N, Q) without gather ops.

    Builds the (N, Q, K) one-hot mask and contracts over K on the MXU/VPU.
    Cost O(N*Q*K) dense flops — a win over gather for K <= a few hundred.
    """
    K = values.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    onehot = (idx[..., None] == iota).astype(values.dtype)
    return jnp.einsum("nqk,nk->nq", onehot, values)


def rank_merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge per-row sorted a (N, A) and b (N, B) into sorted (N, A+B).

    Each element's output position is its own rank plus its rank in the other
    array (strict/non-strict split keeps ties stable, a-before-b).  The
    scatter is realized as two one-hot contractions.
    """
    N, A = a.shape
    B = b.shape[-1]
    # rank of a_i among b: #{b_j <= a_i};  rank of b_j among a: #{a_i < b_j}
    ra = jnp.sum((b[:, None, :] <= a[:, :, None]).astype(jnp.int32), -1)
    rb = jnp.sum((a[:, None, :] < b[:, :, None]).astype(jnp.int32), -1)
    pos_a = jax.lax.broadcasted_iota(jnp.int32, (N, A), 1) + ra
    pos_b = jax.lax.broadcasted_iota(jnp.int32, (N, B), 1) + rb

    K = A + B
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    out = jnp.einsum("nak,na->nk", (pos_a[..., None] == iota).astype(a.dtype), a)
    out += jnp.einsum("nbk,nb->nk", (pos_b[..., None] == iota).astype(b.dtype), b)
    return out


def sorted_uniform(rng, shape) -> jnp.ndarray:
    """Per-row SORTED Uniform(0,1) order statistics, O(n) with no sort.

    Normalized cumulative exponential spacings: if E_1..E_{n+1} ~ Exp(1),
    then (S_1/S_{n+1}, ..., S_n/S_{n+1}) with S_k = sum_{i<=k} E_i is
    distributed as the order statistics of n iid uniforms.
    """
    *batch, n = shape
    e = jax.random.exponential(rng, (*batch, n + 1))
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / s[..., -1:]

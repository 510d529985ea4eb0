"""Tests for the TPU-friendly sorting/gather primitives."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from nerf_fl_tpu.ops.sorting import (onehot_gather, rank_merge_sorted,
                                     sorted_uniform)


def test_onehot_gather_matches_take_along_axis():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(7, 33)).astype(np.float32)
    idx = rng.integers(0, 33, (7, 12)).astype(np.int32)
    ours = np.asarray(onehot_gather(jnp.asarray(v), jnp.asarray(idx)))
    ref = np.take_along_axis(v, idx, axis=1)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_rank_merge_matches_sort():
    rng = np.random.default_rng(1)
    a = np.sort(rng.normal(size=(9, 16)).astype(np.float32), -1)
    b = np.sort(rng.normal(size=(9, 24)).astype(np.float32), -1)
    ours = np.asarray(rank_merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    ref = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_rank_merge_with_ties():
    a = np.asarray([[1.0, 2.0, 2.0, 5.0]], np.float32)
    b = np.asarray([[2.0, 2.0, 3.0]], np.float32)
    ours = np.asarray(rank_merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, [[1, 2, 2, 2, 2, 3, 5]], atol=0)


def test_sorted_uniform_is_sorted_and_uniform():
    u = np.asarray(sorted_uniform(jax.random.PRNGKey(0), (200, 64)))
    assert (np.diff(u, axis=-1) >= 0).all()
    assert (u > 0).all() and (u < 1).all()
    # pooled samples should be Uniform(0, 1): KS test
    stat, p = stats.kstest(u.reshape(-1), "uniform")
    assert p > 1e-3, (stat, p)

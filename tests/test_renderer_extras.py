"""Renderer behaviors beyond reference parity: coarse-only test-time render,
keyed chunked outputs, BARF-annealed render path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.render import RenderConfig, render_rays
from nerf_fl_tpu.training.system import build_params, render_chunked


def make_rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32),
         np.full((n, 1), 6, np.float32)], 1)


def test_coarse_only_test_time_renders_rgb():
    # divergence from the reference (which leaves a coarse-only model
    # unrenderable at test time, rendering.py:103-111)
    cfg = RenderConfig(N_samples=16, N_importance=0, perturb=0.0,
                       noise_std=0.0)
    params = build_params(jax.random.PRNGKey(0), cfg, 4)
    rays = jnp.asarray(make_rays())
    ts = jnp.zeros((64,), jnp.int32)
    res = render_rays(params, rays, ts, None, cfg, test_time=True)
    assert "rgb_coarse" in res and "depth_coarse" in res
    res2 = render_rays(params, rays, ts, None, cfg, test_time=False)
    np.testing.assert_allclose(np.asarray(res["rgb_coarse"]),
                               np.asarray(res2["rgb_coarse"]), atol=1e-6)


def test_render_chunked_keys_filter():
    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=0.0,
                       noise_std=0.0)
    params = build_params(jax.random.PRNGKey(0), cfg, 4)
    rays = make_rays(100)
    ts = np.zeros(100, np.int32)
    res = render_chunked(params, rays, ts, cfg, chunk=64, test_time=True,
                         keys=("rgb_fine", "depth_fine"))
    assert set(res) == {"rgb_fine", "depth_fine"}
    full = render_chunked(params, rays, ts, cfg, chunk=64, test_time=True)
    np.testing.assert_allclose(res["rgb_fine"], full["rgb_fine"], atol=1e-6)
    assert "weights_fine" in full


def test_barf_render_changes_with_epoch():
    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=0.0,
                       noise_std=0.0, refine_pose=True)
    params = build_params(jax.random.PRNGKey(0), cfg, 4)
    rays = jnp.asarray(make_rays())
    ts = jnp.zeros((64,), jnp.int32)
    r_early = render_rays(params, rays, ts, None, cfg, epoch=0.0)
    r_late = render_rays(params, rays, ts, None, cfg, epoch=10.0)
    # annealing gates high frequencies early -> different renders
    assert not np.allclose(np.asarray(r_early["rgb_fine"]),
                           np.asarray(r_late["rgb_fine"]), atol=1e-4)
    # past epoch_end alpha saturates at N_freqs, so all later epochs render
    # identically (NOTE: the fork compares alpha against the frequency VALUE
    # 2^k, so frequencies above N_freqs stay gated forever — preserved
    # behavior, see core/encoding.py barf_weights and the oracle test)
    r_later = render_rays(params, rays, ts, None, cfg, epoch=100.0)
    np.testing.assert_allclose(np.asarray(r_late["rgb_fine"]),
                               np.asarray(r_later["rgb_fine"]), atol=1e-6)


def test_remat_mlp_matches_values_and_grads():
    """--remat_mlp must be a pure scheduling change: identical render
    values AND identical loss gradients (the checkpointed backward
    recomputes the same ops; only what is SAVED changes).  The perf
    question — trading idle MXU FLOPs for HBM activation traffic — is
    measured on device (docs/PERF.md round-5 remat probe); this pins the
    math so the lever is always safe to flip."""
    from dataclasses import replace

    cfg = RenderConfig(N_samples=8, N_importance=8, encode_a=True,
                       encode_t=True, beta_min=0.1, perturb=0.0,
                       noise_std=0.0, mlp_depth=4, mlp_width=32)
    params = build_params(jax.random.PRNGKey(0), cfg, 4)
    rays = jnp.asarray(make_rays(32))
    ts = jnp.zeros((32,), jnp.int32)
    rgbs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (32, 3)).astype(np.float32))

    def loss_fn(p, c):
        res = render_rays(p, rays, ts, jax.random.PRNGKey(2), c,
                          test_time=False)
        return jnp.mean((res["rgb_fine"] - rgbs) ** 2)

    for c in (cfg, replace(cfg, compute_dtype="bfloat16")):
        l0, g0 = jax.value_and_grad(loss_fn)(params, c)
        l1, g1 = jax.value_and_grad(loss_fn)(
            params, replace(c, remat_mlp=True))
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-6, atol=0)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7), g0, g1)

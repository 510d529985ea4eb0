"""Numerical parity of the full render pipeline against the reference
implementation (deterministic settings: perturb=0, noise_std=0)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.models import init_embedding, init_nerf
from nerf_fl_tpu.render import RenderConfig, render_rays

from tests import torch_oracle

pytestmark = pytest.mark.skipif(
    not torch_oracle.reference_available(),
    reason="reference oracle unavailable")

N_RAYS = 24


def make_rays(seed=0, n=N_RAYS):
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 1, (n, 3))
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0)
    far = np.full((n, 1), 6.0)
    return np.concatenate([o, d, near, far], 1).astype(np.float32)


def make_params(cfg, seed=0, n_vocab=20):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    p = {"nerf_coarse": init_nerf(keys[0], cfg.nerf_config("coarse"))}
    if cfg.N_importance > 0:
        p["nerf_fine"] = init_nerf(keys[1], cfg.nerf_config("fine"))
    if cfg.encode_a:
        p["embedding_a"] = init_embedding(keys[2], n_vocab, cfg.N_a)
    if cfg.encode_t:
        p["embedding_t"] = init_embedding(keys[3], n_vocab, cfg.N_tau)
    return p


def run_ours(params, cfg, rays, ts, **kw):
    res = render_rays(params, jnp.asarray(rays), jnp.asarray(ts), None,
                      cfg, **kw)
    return {k: np.asarray(v) for k, v in res.items()}


def check(cfg, *, test_time=False, output_transient=True, atol=2e-4, seed=0):
    rays = make_rays(seed)
    ts = (np.arange(N_RAYS) % 7).astype(np.int64)
    params = make_params(cfg, seed)
    ours = run_ours(params, cfg, rays, ts.astype(np.int32),
                    test_time=test_time, output_transient=output_transient)
    ref = torch_oracle.run_reference_render(
        params, cfg, rays, ts, test_time=test_time,
        output_transient=output_transient)
    # compare every key the reference produced
    for k, rv in ref.items():
        assert k in ours, f"missing key {k}"
        ov = ours[k]
        assert ov.shape == rv.shape, f"{k}: {ov.shape} vs {rv.shape}"
        np.testing.assert_allclose(ov, rv, atol=atol, rtol=1e-3,
                                   err_msg=f"mismatch in {k}")


BASE = dict(N_samples=32, perturb=0.0, noise_std=0.0)


def test_coarse_only():
    check(RenderConfig(N_importance=0, **BASE))


def test_coarse_only_white_back():
    check(RenderConfig(N_importance=0, white_back=True, **BASE))


def test_coarse_fine():
    check(RenderConfig(N_importance=16, **BASE))


def test_coarse_fine_disp():
    check(RenderConfig(N_importance=16, use_disp=True, **BASE))


def test_nerf_a():
    check(RenderConfig(N_importance=16, encode_a=True, **BASE))


def test_nerf_u():
    check(RenderConfig(N_importance=16, encode_t=True, beta_min=0.1, **BASE))


def test_nerf_w():
    check(RenderConfig(N_importance=16, encode_a=True, encode_t=True,
                       beta_min=0.1, white_back=True, **BASE))


def test_nerf_w_test_time():
    check(RenderConfig(N_importance=16, encode_a=True, encode_t=True,
                       beta_min=0.1, white_back=True, **BASE), test_time=True)


def test_nerf_w_no_transient_eval():
    # eval.py:184 disables the transient field on phototourism test renders
    check(RenderConfig(N_importance=16, encode_a=True, encode_t=True,
                       beta_min=0.1, **BASE),
          test_time=True, output_transient=False)


def test_coarse_fine_test_time():
    check(RenderConfig(N_importance=16, **BASE), test_time=True)

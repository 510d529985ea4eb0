"""Fused Pallas PE+MLP kernel: exactness vs the XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.core import encoding
from nerf_fl_tpu.models import NeRFConfig, apply_nerf, init_nerf
from nerf_fl_tpu.ops.fused_mlp import fused_apply_nerf


def setup(transient: bool, seed=0, n=1024):
    cfg = NeRFConfig(typ="fine", encode_appearance=transient,
                     in_channels_a=48, encode_transient=transient,
                     in_channels_t=16)
    params = init_nerf(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    a = jnp.asarray(rng.normal(0, 1, (n, 48)).astype(np.float32)) \
        if transient else None
    t = jnp.asarray(rng.normal(0, 1, (n, 16)).astype(np.float32)) \
        if transient else None
    return cfg, params, xyz, dirs, a, t


def xla_reference(cfg, params, xyz, dirs, a, t, transient,
                  bw_x=None, bw_d=None):
    """embed (optionally BARF-annealed) + apply_nerf — the XLA path."""
    xyz_emb = encoding.posenc(xyz, 10, weights=bw_x)
    dir_emb = encoding.posenc(dirs, 4, weights=bw_d)
    dir_a = dir_emb if a is None else jnp.concatenate([dir_emb, a], -1)
    return apply_nerf(params, cfg, xyz_emb, dir_a, t,
                      output_transient=transient, compute_dtype=jnp.float32)


@pytest.mark.parametrize("transient", [False, True])
def test_fused_forward_matches_xla(transient):
    cfg, params, xyz, dirs, a, t = setup(transient)
    ref = xla_reference(cfg, params, xyz, dirs, a, t, transient)
    got = fused_apply_nerf(params, xyz, dirs, a, t,
                           output_transient=transient,
                           compute_dtype=jnp.float32, interpret=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, err_msg=k)


def test_fused_forward_barf_annealing():
    """The in-kernel per-column scale row reproduces BARF annealing."""
    cfg, params, xyz, dirs, a, t = setup(True)
    bw_x = encoding.barf_weights(6.0, 10, 4, 8)
    bw_d = encoding.barf_weights(6.0, 4, 4, 8)
    ref = xla_reference(cfg, params, xyz, dirs, a, t, True, bw_x, bw_d)
    got = fused_apply_nerf(params, xyz, dirs, a, t, output_transient=True,
                           compute_dtype=jnp.float32,
                           barf_w_xyz=bw_x, barf_w_dir=bw_d, interpret=True)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, err_msg=k)


@pytest.mark.parametrize("transient", [False, True])
def test_fused_grads_match_xla(transient):
    cfg, params, xyz, dirs, a, t = setup(transient)

    def loss_ref(p, x, d, a_, t_):
        o = xla_reference(cfg, p, x, d, a_, t_, transient)
        return sum(jnp.sum(v) for v in o.values())

    def loss_fused(p, x, d, a_, t_):
        o = fused_apply_nerf(p, x, d, a_, t_, output_transient=transient,
                             compute_dtype=jnp.float32, interpret=True)
        return sum(jnp.sum(v) for v in o.values())

    argnums = (0, 1, 2, 3, 4) if transient else (0, 1, 2)
    g1 = jax.grad(loss_ref, argnums=argnums)(params, xyz, dirs, a, t)
    g2 = jax.grad(loss_fused, argnums=argnums)(params, xyz, dirs, a, t)

    def relerr(x, y):
        return float((jnp.abs(x - y) / (jnp.abs(x) + 1e-3)).max())

    errs = jax.tree_util.tree_map(relerr, g1, g2)
    max_err = max(jax.tree_util.tree_leaves(errs))
    assert max_err < 2e-3, max_err


def test_fused_pads_ragged_batch():
    # n not a multiple of the kernel tile
    cfg, params, xyz, dirs, a, t = setup(True, n=700)
    ref = xla_reference(cfg, params, xyz, dirs, a, t, True)
    got = fused_apply_nerf(params, xyz, dirs, a, t, output_transient=True,
                           compute_dtype=jnp.float32, interpret=True)
    for k in ref:
        assert got[k].shape == ref[k].shape
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, err_msg=k)

"""Fused Pallas MLP kernel: exactness vs the XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.models import NeRFConfig, apply_nerf, init_nerf
from nerf_fl_tpu.ops.fused_mlp import fused_apply_nerf


def setup(transient: bool, seed=0, n=1024):
    cfg = NeRFConfig(typ="fine", encode_appearance=transient,
                     in_channels_a=48, encode_transient=transient,
                     in_channels_t=16)
    params = init_nerf(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(0, 1, (n, 63)).astype(np.float32))
    dira = jnp.asarray(rng.normal(
        0, 1, (n, 27 + (48 if transient else 0))).astype(np.float32))
    temb = jnp.asarray(rng.normal(0, 1, (n, 16)).astype(np.float32)) \
        if transient else None
    return cfg, params, xyz, dira, temb


@pytest.mark.parametrize("transient", [False, True])
def test_fused_forward_matches_xla(transient):
    cfg, params, xyz, dira, temb = setup(transient)
    ref = apply_nerf(params, cfg, xyz, dira, temb,
                     output_transient=transient, compute_dtype=jnp.float32)
    got = fused_apply_nerf(params, xyz, dira, temb,
                           output_transient=transient,
                           compute_dtype=jnp.float32, interpret=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


@pytest.mark.parametrize("transient", [False, True])
def test_fused_grads_match_xla(transient):
    cfg, params, xyz, dira, temb = setup(transient)

    def loss_ref(p, x, d, t):
        o = apply_nerf(p, cfg, x, d, t, output_transient=transient,
                       compute_dtype=jnp.float32)
        return sum(jnp.sum(v) for v in o.values())

    def loss_fused(p, x, d, t):
        o = fused_apply_nerf(p, x, d, t, output_transient=transient,
                             compute_dtype=jnp.float32, interpret=True)
        return sum(jnp.sum(v) for v in o.values())

    argnums = (0, 1, 2, 3) if transient else (0, 1, 2)
    g1 = jax.grad(loss_ref, argnums=argnums)(params, xyz, dira, temb)
    g2 = jax.grad(loss_fused, argnums=argnums)(params, xyz, dira, temb)

    def relerr(a, b):
        return float((jnp.abs(a - b) / (jnp.abs(a) + 1e-3)).max())

    errs = jax.tree_util.tree_map(relerr, g1, g2)
    max_err = max(jax.tree_util.tree_leaves(errs))
    assert max_err < 1e-3, max_err


def test_fused_pads_ragged_batch():
    # n not a multiple of the kernel tile
    cfg, params, xyz, dira, temb = setup(True, n=700)
    ref = apply_nerf(params, cfg, xyz, dira, temb, output_transient=True,
                     compute_dtype=jnp.float32)
    got = fused_apply_nerf(params, xyz, dira, temb, output_transient=True,
                           compute_dtype=jnp.float32, interpret=True)
    for k in ref:
        assert got[k].shape == ref[k].shape
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)

"""MLP, embedding and learned-pose tests (incl. torch-oracle parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.models import (NeRFConfig, apply_nerf, embedding_lookup,
                                init_embedding, init_learn_pose, init_nerf,
                                num_params, pose_for, validate_vocab)
from nerf_fl_tpu.models.poses import all_poses

from tests import torch_oracle

needs_oracle = pytest.mark.skipif(
    not torch_oracle.reference_available(), reason="no oracle")


def test_coarse_config_drops_appearance_and_transient():
    cfg = NeRFConfig(typ="coarse", encode_appearance=True,
                     encode_transient=True)
    assert not cfg.encode_appearance and not cfg.encode_transient
    fine = NeRFConfig(typ="fine", encode_appearance=True,
                      encode_transient=True)
    assert fine.encode_appearance and fine.encode_transient


def test_param_count_matches_reference_arch():
    # plain coarse NeRF: known parameter count from the architecture
    cfg = NeRFConfig(typ="coarse")
    p = init_nerf(jax.random.PRNGKey(0), cfg)
    expect = 0
    dims = [(63, 256)] + [(256, 256)] * 3 + [(256 + 63, 256)] + [(256, 256)] * 3
    for i, o in dims:
        expect += i * o + o
    expect += 256 * 256 + 256            # xyz_final
    expect += (256 + 27) * 128 + 128     # dir
    expect += 256 * 1 + 1 + 128 * 3 + 3  # heads
    assert num_params(p) == expect


@needs_oracle
def test_mlp_forward_matches_reference():
    import torch
    cfg = NeRFConfig(typ="fine", encode_appearance=True, in_channels_a=48,
                     encode_transient=True, in_channels_t=16)
    p = init_nerf(jax.random.PRNGKey(1), cfg)
    m = torch_oracle.to_torch_nerf(p, cfg)

    rng = np.random.default_rng(0)
    B = 37
    xyz = rng.normal(size=(B, 63)).astype(np.float32)
    dir_a = rng.normal(size=(B, 27 + 48)).astype(np.float32)
    t = rng.normal(size=(B, 16)).astype(np.float32)

    ours = apply_nerf(p, cfg, jnp.asarray(xyz), jnp.asarray(dir_a),
                      jnp.asarray(t), output_transient=True)
    with torch.no_grad():
        ref = m(torch.tensor(np.concatenate([xyz, dir_a, t], 1)),
                output_transient=True).numpy()
    np.testing.assert_allclose(np.asarray(ours["static_rgb"]), ref[:, :3],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["static_sigma"]), ref[:, 3],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["transient_rgb"]), ref[:, 4:7],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["transient_sigma"]), ref[:, 7],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["transient_beta"]), ref[:, 8],
                               atol=1e-5)
    # sigma-only path
    ours_s = apply_nerf(p, cfg, jnp.asarray(xyz), sigma_only=True)
    with torch.no_grad():
        ref_s = m(torch.tensor(xyz), sigma_only=True).numpy()
    np.testing.assert_allclose(np.asarray(ours_s["static_sigma"]),
                               ref_s[:, 0], atol=1e-5)


def test_init_statistics_match_torch_defaults():
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias
    cfg = NeRFConfig(typ="coarse")
    p = init_nerf(jax.random.PRNGKey(2), cfg)
    w = np.asarray(p["xyz"][1]["w"])  # fan_in 256
    bound = 1 / np.sqrt(256)
    assert np.abs(w).max() <= bound
    assert np.abs(w).mean() == pytest.approx(bound / 2, rel=0.05)


def test_embedding_lookup_and_validation():
    table = init_embedding(jax.random.PRNGKey(3), 10, 4)
    out = embedding_lookup(table, jnp.asarray([0, 3, 9]))
    assert out.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(table[3]))
    validate_vocab(10, 9)
    with pytest.raises(ValueError):
        validate_vocab(10, 10)


def test_learn_pose_zero_deltas_reproduce_init():
    rng = np.random.default_rng(7)
    init = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    init[:, :3, 3] = rng.normal(size=(5, 3))
    p = init_learn_pose(5, init)
    poses = np.asarray(all_poses(p))
    np.testing.assert_allclose(poses, init, atol=1e-6)


def test_learn_pose_delta_composition():
    init = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    p = init_learn_pose(2, init)
    p["r"] = p["r"].at[0].set(jnp.asarray([0.0, 0.0, np.pi / 2]))
    p["t"] = p["t"].at[0].set(jnp.asarray([1.0, 0.0, 0.0]))
    poses = np.asarray(pose_for(p, jnp.asarray([0, 1])))
    np.testing.assert_allclose(poses[0][:3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    np.testing.assert_allclose(poses[0][:3, 3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(poses[1], np.eye(4), atol=1e-6)

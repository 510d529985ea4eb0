"""Unit tests for geometry, encoding, sampling and compositing primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.core import compositing, encoding, lie, rays, sampling
from nerf_fl_tpu.data import rays_np

from tests import torch_oracle


# ---------------------------------------------------------------- rays
def test_ray_directions_principal_point():
    K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    d = np.asarray(rays.get_ray_directions(24, 32, K))
    # at the principal point the direction is exactly the -z axis
    np.testing.assert_allclose(d[12, 16], [0, 0, -1], atol=1e-7)
    # x grows with column, y DEcreases with row (OpenGL convention)
    assert d[12, 20, 0] > 0 and d[20, 16, 1] < 0


def test_ray_directions_jax_matches_numpy():
    K = np.array([[57.0, 0, 20.5], [0, 57.0, 13.5], [0, 0, 1]])
    a = np.asarray(rays.get_ray_directions(27, 41, K))
    b = rays_np.get_ray_directions(27, 41, K)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_get_rays_shared_and_per_ray_pose_agree():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(17, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, 3] = [1, 2, 3]
    o1, d1 = rays.get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
    o2, d2 = rays.get_rays(jnp.asarray(dirs),
                           jnp.broadcast_to(c2w, (17, 3, 4)))
    np.testing.assert_allclose(o1, o2, atol=1e-6)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d1), axis=-1), 1.0,
                               atol=1e-5)
    o3, d3 = rays_np.get_rays(dirs, c2w)
    np.testing.assert_allclose(o1, o3, atol=1e-6)
    np.testing.assert_allclose(d1, d3, atol=1e-6)


def test_ndc_rays_match_numpy():
    rng = np.random.default_rng(1)
    o = rng.normal(size=(9, 3)).astype(np.float32)
    d = rng.normal(size=(9, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    o[:, 2] = -np.abs(o[:, 2]) - 2.0
    a = rays.get_ndc_rays(40, 30, 35.0, 1.0, jnp.asarray(o), jnp.asarray(d))
    b = rays_np.get_ndc_rays(40, 30, 35.0, 1.0, o, d)
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)
    np.testing.assert_allclose(a[1], b[1], atol=1e-5)


# ---------------------------------------------------------------- lie
def test_exp_so3_is_rotation():
    r = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)) * 0.5)
    R = np.asarray(lie.exp_so3(r))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) == pytest.approx(1.0, abs=1e-5)


def test_exp_so3_zero_is_identity():
    R = np.asarray(lie.exp_so3(jnp.zeros((3,))))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_exp_so3_known_rotation():
    # pi/2 about z
    R = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(
        R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)


def test_make_c2w_composition():
    r = jnp.asarray([0.1, -0.2, 0.3])
    t = jnp.asarray([1.0, 2.0, 3.0])
    M = np.asarray(lie.make_c2w(r, t))
    assert M.shape == (4, 4)
    np.testing.assert_allclose(M[3], [0, 0, 0, 1], atol=0)
    np.testing.assert_allclose(M[:3, 3], [1, 2, 3], atol=1e-6)


# ------------------------------------------------------------ encoding
@pytest.mark.skipif(not torch_oracle.reference_available(),
                    reason="no oracle")
def test_posenc_matches_reference():
    import torch
    x = np.random.default_rng(3).normal(size=(13, 3)).astype(np.float32)
    for nf in (4, 10):
        ours = np.asarray(encoding.posenc(jnp.asarray(x), nf))
        ref = torch_oracle.torch_pos_embedding(nf)(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.skipif(not torch_oracle.reference_available(),
                    reason="no oracle")
def test_barf_weights_match_reference():
    ref_nerf, _, _ = torch_oracle.get_reference()
    emb = ref_nerf.BarfPosEmbedding(9, 10, 4, 8)
    for epoch in [0, 3, 4, 5, 6, 7, 8, 9, 12]:
        ref_w = np.array([float(emb.barf_weight(f, epoch))
                          for f in emb.freqs])
        ours = np.asarray(encoding.barf_weights(float(epoch), 10, 4, 8))
        np.testing.assert_allclose(ours, ref_w, atol=1e-6, err_msg=f"epoch {epoch}")


def test_barf_schedules_fork_vs_paper():
    """The fork rule permanently zeroes every band with 2^k >= N_freqs
    (reference nerf.py:47-59 quirk); the paper rule (BARF eq. 14) must
    activate ALL bands by epoch_end and ramp monotonically by index."""
    # fork: long after epoch_end, alpha = N_freqs = 10 vs values 2^k
    w_fork = np.asarray(encoding.barf_weights(100.0, 10, 4, 8))
    np.testing.assert_allclose(w_fork[:4], 1.0)   # 2^0..2^3 <= 8 active
    np.testing.assert_allclose(w_fork[4:], 0.0)   # 2^4..2^9 dead forever
    # paper: all bands fully on from epoch_end
    for epoch in (8.0, 100.0):
        w = np.asarray(encoding.barf_weights(epoch, 10, 4, 8,
                                             schedule="paper"))
        np.testing.assert_allclose(w, 1.0)
    # before the window: all off; mid-window: low-index bands lead
    w0 = np.asarray(encoding.barf_weights(4.0, 10, 4, 8, schedule="paper"))
    np.testing.assert_allclose(w0, 0.0)
    w6 = np.asarray(encoding.barf_weights(6.0, 10, 4, 8, schedule="paper"))
    assert np.all(np.diff(w6) <= 1e-6)            # monotone by index
    np.testing.assert_allclose(w6[:5], 1.0)       # alpha = 5 at midpoint
    np.testing.assert_allclose(w6[5:], 0.0)


def test_posenc_fast_trig_accuracy():
    """Cody-Waite polynomial PE (the bf16 compute path) must match exact f32
    sin/cos to ~1e-6 — far below bf16 resolution — over the full PE argument
    range (|x| up to ~8 scene units -> args up to 2^9 * 8 = 4096)."""
    import jax
    x = np.random.default_rng(5).uniform(-8, 8, size=(512, 3)).astype(
        np.float32)
    exact = np.asarray(encoding.posenc(jnp.asarray(x), 10))
    fast = np.asarray(encoding.posenc(jnp.asarray(x), 10, fast=True))
    assert np.abs(fast - exact).max() < 3e-6

    # gradients: d/dx sin(fx) = f cos(fx) with f up to 512, so the gradient
    # SCALE is ~512; the polynomial's derivative error measures ~6e-3
    # absolute = ~1e-5 relative to that scale (bf16 resolution is ~4e-3)
    g_exact = jax.grad(
        lambda v: encoding.posenc(v, 10).sum())(jnp.asarray(x))
    g_fast = jax.grad(
        lambda v: encoding.posenc(v, 10, fast=True).sum())(jnp.asarray(x))
    assert np.abs(np.asarray(g_fast) - np.asarray(g_exact)).max() < 2e-2


def test_posenc_dim():
    assert encoding.posenc_dim(3, 10) == 63
    assert encoding.posenc_dim(3, 4) == 27
    x = jnp.ones((5, 3))
    assert encoding.posenc(x, 10).shape == (5, 63)


# ------------------------------------------------------------ sampling
def test_searchsorted_right_matches_numpy():
    rng = np.random.default_rng(4)
    seq = np.sort(rng.uniform(0, 1, (6, 33)), axis=-1)
    q = rng.uniform(-0.1, 1.1, (6, 17))
    ours = np.asarray(sampling.searchsorted_right(jnp.asarray(seq),
                                                  jnp.asarray(q)))
    for i in range(6):
        ref = np.searchsorted(seq[i], q[i], side="right")
        np.testing.assert_array_equal(ours[i], ref)


@pytest.mark.skipif(not torch_oracle.reference_available(),
                    reason="no oracle")
def test_sample_pdf_det_matches_reference():
    import torch
    _, ref_rendering, _ = torch_oracle.get_reference()
    rng = np.random.default_rng(5)
    bins = np.sort(rng.uniform(2, 6, (8, 31)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, (8, 30)).astype(np.float32)
    weights[2] = 0.0  # zero-weight row exercises the denom guard
    ours = np.asarray(sampling.sample_pdf(jax.random.PRNGKey(0),
                                          jnp.asarray(bins),
                                          jnp.asarray(weights), 16, det=True))
    ref = ref_rendering.sample_pdf(torch.tensor(bins), torch.tensor(weights),
                                   16, det=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_pdf_stochastic_in_support():
    rng = np.random.default_rng(6)
    bins = np.sort(rng.uniform(2, 6, (4, 17)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, (4, 16)).astype(np.float32)
    s = np.asarray(sampling.sample_pdf(jax.random.PRNGKey(1),
                                       jnp.asarray(bins),
                                       jnp.asarray(weights), 64, det=False))
    assert (s >= bins[:, :1]).all() and (s <= bins[:, -1:]).all()


def test_stratified_z_vals_deterministic():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(sampling.stratified_z_vals(None, near, far, 8, perturb=0.0))
    np.testing.assert_allclose(z[0], np.linspace(2, 6, 8), atol=1e-6)
    zd = np.asarray(sampling.stratified_z_vals(
        None, near, far, 8, use_disp=True, perturb=0.0))
    np.testing.assert_allclose(1 / zd[0], np.linspace(1 / 2, 1 / 6, 8),
                               atol=1e-6)


def test_stratified_z_vals_perturbed_within_bins():
    near = jnp.full((64, 1), 2.0)
    far = jnp.full((64, 1), 6.0)
    z0 = np.asarray(sampling.stratified_z_vals(None, near, far, 16, perturb=0.0))
    z = np.asarray(sampling.stratified_z_vals(
        jax.random.PRNGKey(2), near, far, 16, perturb=1.0))
    assert (np.diff(z, axis=-1) > -1e-6).all()  # still sorted
    mid = 0.5 * (z0[:, :-1] + z0[:, 1:])
    lower = np.concatenate([z0[:, :1], mid], -1)
    upper = np.concatenate([mid, z0[:, -1:]], -1)
    assert (z >= lower - 1e-5).all() and (z <= upper + 1e-5).all()


# ---------------------------------------------------------- compositing
def test_transmittance_opaque_first_sample():
    # one fully opaque sample -> all weight on it
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    sig = jnp.asarray([[1e6, 0.0, 0.0]])
    rgb = jnp.ones((1, 3, 3)) * 0.25
    c = compositing.composite_static(z, rgb, sig)
    np.testing.assert_allclose(np.asarray(c.weights), [[1, 0, 0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c.rgb), [[0.25] * 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c.depth), [1.0], atol=1e-5)


def test_white_back_fills_empty_space():
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    sig = jnp.zeros((1, 3))
    rgb = jnp.zeros((1, 3, 3))
    c = compositing.composite_static(z, rgb, sig, white_back=True)
    np.testing.assert_allclose(np.asarray(c.rgb), [[1, 1, 1]], atol=1e-5)


def test_delta_inf_terminal_bin():
    d = np.asarray(compositing.ray_deltas(jnp.asarray([[1.0, 2.0, 4.0]])))
    np.testing.assert_allclose(d, [[1.0, 2.0, 100.0]], atol=0)

"""Loss and metric tests (incl. torch-oracle parity for the NeRF-W loss)."""
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.training import losses, metrics

from tests import torch_oracle

needs_oracle = pytest.mark.skipif(
    not torch_oracle.reference_available(), reason="no oracle")


def fake_results(rng, n=16, s=8, with_fine=True, with_beta=True):
    res = {"rgb_coarse": rng.uniform(0, 1, (n, 3)).astype(np.float32)}
    if with_fine:
        res["rgb_fine"] = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    if with_beta:
        res["beta"] = rng.uniform(0.05, 1.0, (n,)).astype(np.float32)
        res["transient_sigmas"] = rng.uniform(0, 2, (n, s)).astype(np.float32)
    return res


@needs_oracle
@pytest.mark.parametrize("with_fine,with_beta",
                         [(False, False), (True, False), (True, True)])
def test_nerfw_loss_matches_reference(with_fine, with_beta):
    import torch
    _, _, ref_losses = torch_oracle.get_reference()
    rng = np.random.default_rng(0)
    res = fake_results(rng, with_fine=with_fine, with_beta=with_beta)
    targets = rng.uniform(0, 1, (16, 3)).astype(np.float32)

    ours = losses.nerfw_loss({k: jnp.asarray(v) for k, v in res.items()},
                             jnp.asarray(targets))
    ref = ref_losses.NerfWLoss(coef=1)(
        {k: torch.tensor(v) for k, v in res.items()}, torch.tensor(targets))
    assert set(ours.keys()) == set(ref.keys())
    for k in ref:
        assert float(ours[k]) == pytest.approx(float(ref[k]), abs=1e-6)


@needs_oracle
def test_color_loss_matches_reference():
    import torch
    _, _, ref_losses = torch_oracle.get_reference()
    rng = np.random.default_rng(1)
    res = fake_results(rng, with_beta=False)
    targets = rng.uniform(0, 1, (16, 3)).astype(np.float32)
    ours = losses.color_loss({k: jnp.asarray(v) for k, v in res.items()},
                             jnp.asarray(targets), coef=2.0)
    ref = ref_losses.ColorLoss(coef=2.0)(
        {k: torch.tensor(v) for k, v in res.items()}, torch.tensor(targets))
    assert float(ours["color"]) == pytest.approx(float(ref), abs=1e-6)


def test_psnr_known_value():
    a = jnp.zeros((4, 3))
    b = jnp.full((4, 3), 0.1)
    assert float(metrics.psnr(a, b)) == pytest.approx(20.0, abs=1e-4)


def test_psnr_with_mask():
    pred = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    gt = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]])
    mask = jnp.asarray([True, False])
    assert float(metrics.mse(pred, gt, mask)) == pytest.approx(0.01, abs=1e-6)


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    s_same = float(metrics.ssim(jnp.asarray(img), jnp.asarray(img)))
    assert s_same == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s_noisy = float(metrics.ssim(jnp.asarray(noisy), jnp.asarray(img)))
    very_noisy = rng.uniform(0, 1, img.shape).astype(np.float32)
    s_rand = float(metrics.ssim(jnp.asarray(very_noisy), jnp.asarray(img)))
    assert s_same > s_noisy > s_rand

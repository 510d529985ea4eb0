"""Optimizer and LR-schedule parity tests against torch (reference
utils/__init__.py:24-61, warmup_scheduler.py)."""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_fl_tpu.training.optimizers import (build_optimizer, lr_for_epoch,
                                             make_trainable_mask, mask_updates)


def hp(**kw):
    d = dict(optimizer="adam", lr=5e-4, momentum=0.9, weight_decay=0.0,
             lr_scheduler="steplr", decay_step=[20], decay_gamma=0.1,
             num_epochs=16, warmup_epochs=0, warmup_multiplier=1.0,
             poly_exp=0.9)
    d.update(kw)
    return types.SimpleNamespace(**d)


def run_steps(h, steps=5, lr=1e-1):
    """Optimize f(x) = sum(x^2) a few steps; return trajectory."""
    tx = build_optimizer(h)
    x = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    state = tx.init(x)
    traj = []
    for _ in range(steps):
        g = jax.tree_util.tree_map(lambda v: 2 * v, x)
        u, state = tx.update(g, state, x)
        x = jax.tree_util.tree_map(lambda p, d: p - lr * d, x, u)
        traj.append(np.asarray(x["w"]))
    return traj


def run_torch(optim_name, steps=5, lr=1e-1, **kw):
    import torch
    x = torch.tensor([1.0, -2.0, 3.0], requires_grad=True)
    cls = {"adam": torch.optim.Adam, "sgd": torch.optim.SGD}[optim_name]
    opt = cls([x], lr=lr, **kw)
    traj = []
    for _ in range(steps):
        opt.zero_grad()
        (x**2).sum().backward()
        opt.step()
        traj.append(x.detach().numpy().copy())
    return traj


def test_adam_matches_torch():
    ours = run_steps(hp(optimizer="adam"))
    ref = run_torch("adam", eps=1e-8)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_adam_weight_decay_matches_torch():
    ours = run_steps(hp(optimizer="adam", weight_decay=0.01))
    ref = run_torch("adam", eps=1e-8, weight_decay=0.01)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sgd_momentum_matches_torch():
    ours = run_steps(hp(optimizer="sgd"))
    ref = run_torch("sgd", momentum=0.9)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_radam_and_ranger_run():
    for name in ("radam", "ranger"):
        traj = run_steps(hp(optimizer=name), steps=10)
        assert np.all(np.isfinite(traj[-1]))
        assert np.abs(traj[-1]).sum() < np.abs(traj[0]).sum() + 1e-6


def test_steplr_matches_torch_multistep():
    import torch
    h = hp(lr_scheduler="steplr", decay_step=[2, 5], decay_gamma=0.5)
    x = torch.tensor([1.0], requires_grad=True)
    opt = torch.optim.Adam([x], lr=h.lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2, 5],
                                                 gamma=0.5)
    for epoch in range(8):
        torch_lr = opt.param_groups[0]["lr"]
        assert lr_for_epoch(h, epoch) == pytest.approx(torch_lr, rel=1e-6), epoch
        sched.step()


def test_cosine_matches_torch():
    import torch
    h = hp(lr_scheduler="cosine", num_epochs=16)
    x = torch.tensor([1.0], requires_grad=True)
    opt = torch.optim.Adam([x], lr=h.lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=16,
                                                       eta_min=1e-8)
    for epoch in range(16):
        torch_lr = opt.param_groups[0]["lr"]
        assert lr_for_epoch(h, epoch) == pytest.approx(torch_lr, rel=1e-5), epoch
        sched.step()


def test_poly_schedule():
    h = hp(lr_scheduler="poly", num_epochs=10, poly_exp=0.9)
    assert lr_for_epoch(h, 0) == pytest.approx(h.lr)
    assert lr_for_epoch(h, 5) == pytest.approx(h.lr * 0.5**0.9)


def test_warmup_ramp():
    h = hp(warmup_epochs=4, warmup_multiplier=2.0, lr_scheduler="steplr",
           decay_step=[100])
    assert lr_for_epoch(h, 0) == pytest.approx(h.lr)
    assert lr_for_epoch(h, 2) == pytest.approx(h.lr * 1.5)
    assert lr_for_epoch(h, 4) == pytest.approx(h.lr * 2.0)
    # after warmup: base scaled by multiplier
    assert lr_for_epoch(h, 6) == pytest.approx(h.lr * 2.0)
    # warmup skipped for radam/ranger (reference utils/__init__.py:57)
    h2 = hp(optimizer="radam", warmup_epochs=4, warmup_multiplier=2.0,
            lr_scheduler="steplr", decay_step=[100])
    assert lr_for_epoch(h2, 0) == pytest.approx(h2.lr)


def test_trainable_mask_freezes_poses():
    params = {"nerf_coarse": {"xyz": [{"w": jnp.ones((2, 2))}]},
              "learn_poses": {"r": jnp.zeros((3, 3)), "t": jnp.zeros((3, 3)),
                              "init_c2w": jnp.zeros((3, 4, 4))}}
    m = make_trainable_mask(params, refine_pose=False)
    assert m["nerf_coarse"]["xyz"][0]["w"] is True
    assert m["learn_poses"]["r"] is False
    assert m["learn_poses"]["init_c2w"] is False
    m2 = make_trainable_mask(params, refine_pose=True)
    assert m2["learn_poses"]["r"] is True
    assert m2["learn_poses"]["init_c2w"] is False
    upd = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = mask_updates(upd, m)
    assert float(masked["learn_poses"]["r"].sum()) == 0.0
    assert float(masked["nerf_coarse"]["xyz"][0]["w"].sum()) == 4.0

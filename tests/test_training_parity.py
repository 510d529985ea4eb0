"""Lockstep training-trajectory parity with the reference implementation.

Runs BOTH frameworks for 20 Adam steps from identical weights on identical
batches (deterministic rendering: perturb=0, noise_std=0) and requires the
loss curves to track within float32 drift.  This catches silent divergence
anywhere in the gradient path: renderer VJP, loss, optimizer, update rule.
"""
import numpy as np
import pytest

from tests import torch_oracle

pytestmark = pytest.mark.skipif(
    not torch_oracle.reference_available(), reason="no oracle")

STEPS = 20
B = 128


def make_data(n_pool=2048, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n_pool, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n_pool, 1), 2, np.float32),
         np.full((n_pool, 1), 6, np.float32)], 1)
    # view-consistent-ish target keyed on direction
    rgbs = (0.5 + 0.4 * d).astype(np.float32)
    return rays, rgbs


def _run_lockstep(cfg, ts, n_vocab):
    """Train ours and the reference 20 Adam steps from identical weights on
    identical batches; return the two loss curves."""
    import jax
    import jax.numpy as jnp
    import torch

    from nerf_fl_tpu.render import render_rays
    from nerf_fl_tpu.training.losses import nerfw_loss
    from nerf_fl_tpu.training.system import build_params

    params = build_params(jax.random.PRNGKey(0), cfg, n_vocab)
    rays, rgbs = make_data()
    batch_rng = np.random.default_rng(7)
    idxs = [batch_rng.integers(0, len(rays), B) for _ in range(STEPS)]

    # ---- ours ----
    import optax
    tx = optax.scale_by_adam(eps=1e-8)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, r, t, g):
        def loss_of(p):
            res = render_rays(p, r, t, None, cfg)
            return sum(nerfw_loss(res, g).values())
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda u: -5e-4 * u, updates))
        return params, opt_state, loss

    ours = []
    for i in range(STEPS):
        r, g = rays[idxs[i]], rgbs[idxs[i]]
        params_new, opt_state, loss = step(
            params, opt_state, jnp.asarray(r),
            jnp.asarray(ts[idxs[i]].astype(np.int32)), jnp.asarray(g))
        ours.append(float(loss))
        params = params_new

    # ---- reference (identical start weights) ----
    params0 = build_params(jax.random.PRNGKey(0), cfg, n_vocab)
    mc = torch_oracle.to_torch_nerf(params0["nerf_coarse"],
                                    cfg.nerf_config("coarse"))
    mf = torch_oracle.to_torch_nerf(params0["nerf_fine"],
                                    cfg.nerf_config("fine"))
    mc.train(); mf.train()
    emb = {"xyz": torch_oracle.torch_pos_embedding(10),
           "dir": torch_oracle.torch_pos_embedding(4)}
    trainable = list(mc.parameters()) + list(mf.parameters())
    if "embedding_a" in params0:
        emb["a"] = torch_oracle.to_torch_embedding(params0["embedding_a"])
        trainable += list(emb["a"].parameters())
    if "embedding_t" in params0:
        emb["t"] = torch_oracle.to_torch_embedding(params0["embedding_t"])
        trainable += list(emb["t"].parameters())
    _, ref_rendering, ref_losses = torch_oracle.get_reference()
    opt = torch.optim.Adam(trainable, lr=5e-4, eps=1e-8)
    crit = ref_losses.NerfWLoss(coef=1)

    theirs = []
    for i in range(STEPS):
        r, g = rays[idxs[i]], rgbs[idxs[i]]
        res = ref_rendering.render_rays(
            {"coarse": mc, "fine": mf}, emb, torch.tensor(r),
            torch.tensor(ts[idxs[i]]), N_samples=cfg.N_samples,
            use_disp=False, perturb=0, noise_std=0,
            N_importance=cfg.N_importance, chunk=1 << 20, white_back=True,
            test_time=False)
        loss = sum(crit(res, torch.tensor(g)).values())
        opt.zero_grad(); loss.backward(); opt.step()
        theirs.append(float(loss))

    return np.array(ours), np.array(theirs)


def test_adam_training_trajectories_match():
    from nerf_fl_tpu.render import RenderConfig

    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=0.0,
                       noise_std=0.0, white_back=True)
    ts = np.zeros(2048, np.int64)
    ours, theirs = _run_lockstep(cfg, ts, 8)
    # float32 drift compounds; require close tracking throughout
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-5)


def test_nerfw_training_trajectories_match():
    """Full NeRF-W lockstep: BOTH embedding tables trained, transient head,
    beta-weighted NerfWLoss, per-ray ts — the configuration the quality
    matrix's co_nerfw arm trains (reference train.py trains embedding_a/t
    alongside the MLPs).  Guards the combined appearance+transient gradient
    path, which the plain lockstep above never exercises."""
    from nerf_fl_tpu.render import RenderConfig

    cfg = RenderConfig(N_samples=16, N_importance=8, perturb=0.0,
                       noise_std=0.0, white_back=True,
                       encode_a=True, encode_t=True, N_a=48, N_tau=16,
                       beta_min=0.1)
    rng = np.random.default_rng(11)
    ts = rng.integers(0, 8, 2048).astype(np.int64)
    ours, theirs = _run_lockstep(cfg, ts, 8)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-5)



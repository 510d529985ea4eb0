"""BARF pose refinement: machinery proof + bounded joint-training contract.

The reference grafted learned-pose refinement on as its main delta
(models/poses.py, utils/lie_group_helper.py:63-84) but never demonstrated
it works.  Round-4 diagnosis (docs/QUALITY.md "BARF pose refinement",
experiments/r4/registration_probe.py) split the question in two:

1. *Machinery* — the pose-gradient path (exp_map -> assemble_world_rays ->
   render) has its photometric minimum at the true pose and gradient
   descent reaches it **when the basin is wide enough**: frozen-field
   registration converges under low-pass (BARF-annealed) rendering and
   walks into texture-aliased local minima at full PE.  That is exactly
   the coarse-to-fine premise of BARF, demonstrated here as
   test_lowpass_registration_converges.

2. *Joint training at CPU-test scale cannot show full recovery* — with
   ~32 rays/camera/step and ~1.5k total steps the per-step pose-gradient
   SNR is too low for net convergence (BARF itself trains 200k steps).
   The joint test therefore asserts the honest reduced contract: noise
   hurts, --refine_pose with pose-lr controls keeps the poses bounded
   (no Adam random-walk blowup: without --pose_warmup_epochs the error
   measurably grows 2.0 -> 5.3 deg during the white-collapse phase), and
   quality does not fall below the frozen-noisy control.  The full
   recovery demonstration lives at device scale in
   experiments/r4/barf_curve.py (fork arm: 2.58 -> 0.69 deg aligned).
"""
import numpy as np
import pytest

from opt import get_opts
from nerf_fl_tpu.training.logging import NullLogger
from nerf_fl_tpu.training.system import NeRFSystem

pytestmark = pytest.mark.slow

ROT_DEG, TRANS_FRAC = 2.0, 0.02


def _train(argv):
    hp = get_opts(argv)
    system = NeRFSystem(hp, logger=NullLogger())
    system.setup()
    system.configure()
    system.fit()
    return system


@pytest.fixture(scope="module")
def barf_scene(tmp_path_factory):
    from tests.fixtures import make_blender_scene
    root = str(tmp_path_factory.mktemp("barf_scene"))
    # 16 textured views at 64^2: pose registration needs cross-view
    # constraints AND photometric texture (an untextured ball is
    # rotation-symmetric -> poses unobservable)
    make_blender_scene(root, n_train=16, n_val=2, n_test=2, size=64,
                       texture=True)
    return root


def _common(scene, tmp_path, epochs=12):
    return ['--root_dir', scene, '--dataset_name', 'blender',
            '--img_wh', '64', '64', '--N_samples', '16',
            '--N_importance', '16', '--mlp_depth', '4', '--mlp_width', '64',
            '--batch_size', '512', '--noise_std', '0',
            '--num_epochs', str(epochs), '--lr_scheduler', 'cosine',
            '--save_path', str(tmp_path / 'ck'), '--refresh_every', '0']


def test_pose_noise_helpers_roundtrip():
    """perturb_poses injects the advertised magnitudes and pose_errors
    measures them back (aligned and raw)."""
    from nerf_fl_tpu.models.poses import perturb_poses, pose_errors
    from tests.fixtures import _look_at_pose
    true = np.stack([_look_at_pose(0.4 * i) for i in range(12)])
    noisy = perturb_poses(true, 3.0, TRANS_FRAC, seed=0)
    r_raw, t_raw = pose_errors(noisy, true, align=False)
    assert 1.0 < r_raw < 8.0          # RMS 3 deg noise
    assert t_raw > 0.01
    # identical sets measure zero after alignment
    r0, t0 = pose_errors(true, true)
    assert r0 < 1e-6 and t0 < 1e-6
    # determinism
    np.testing.assert_array_equal(
        noisy, perturb_poses(true, 3.0, TRANS_FRAC, seed=0))


def test_gauge_transform_recovers_rigid_motion():
    """gauge_transform must exactly invert a synthetic global SE(3) applied
    to a pose set (the BARF-paper eval convention for gauge drift)."""
    from nerf_fl_tpu.models.poses import gauge_transform, pose_errors
    from tests.fixtures import _look_at_pose
    true = np.stack([_look_at_pose(0.5 * i) for i in range(10)])
    th = 0.3
    G = np.array([[np.cos(th), -np.sin(th), 0, 0.2],
                  [np.sin(th), np.cos(th), 0, -0.1],
                  [0, 0, 1, 0.05],
                  [0, 0, 0, 1.0]])
    moved = np.einsum('ij,njk->nik', G, true)
    T = gauge_transform(moved, true)
    np.testing.assert_allclose(T @ G, np.eye(4), atol=1e-10)
    # and pose_errors(align=True) reports ~0 for a pure gauge shift
    r, t = pose_errors(moved, true, align=True)
    assert r < 1e-6 and t < 1e-8


def test_gauge_render_roundtrip(barf_scene, tmp_path):
    """gauge_val_psnr must round-trip a known coherent SE(3) drift THROUGH
    THE RENDERER (r4 verdict item 3: the old unit test checked camera
    centers only).  Train a field whose every camera pose is G @ true —
    the images are of the original scene, so the reconstruction IS the
    scene transformed by G (the pure-gauge situation).  Then raw val
    (true-frame cameras) must collapse, and gauge rendering (inv(T) @ c2w
    with T estimated by Procrustes from the train poses) must restore it;
    the estimated T must invert G."""
    import jax.numpy as jnp

    from nerf_fl_tpu.training.system import gauge_val_psnr

    th = np.deg2rad(10.0)
    G = np.array([[np.cos(th), -np.sin(th), 0, 0.25],
                  [np.sin(th), np.cos(th), 0, -0.15],
                  [0, 0, 1, 0.1],
                  [0, 0, 0, 1.0]])

    argv = (_common(barf_scene, tmp_path, epochs=8)
            + ['--pose_noise', '1e-12', '1e-12',  # camdir path, frozen deltas
               '--exp_name', 'gauge'])
    hp = get_opts(argv)
    system = NeRFSystem(hp, logger=NullLogger())
    system.setup()
    system.configure()
    drifted = np.einsum('ij,njk->nik', G,
                        np.asarray(system.true_poses, np.float64))
    system.init_poses = drifted.astype(np.float32)
    lp = dict(system.params['learn_poses'])
    lp['init_c2w'] = jnp.asarray(system.init_poses)
    system.params = dict(system.params, learn_poses=lp)
    system.fit()

    _, raw, _ = system.run_validation(epoch=7, max_images=2)
    corrected, T = gauge_val_psnr(system, epoch=7, max_images=2)
    print(f"[gauge-roundtrip] raw {raw:.2f} -> gauge {corrected:.2f} dB")
    # the Procrustes estimate from the train poses must invert G exactly
    # (deltas frozen at zero -> refined poses are exactly G @ true)
    np.testing.assert_allclose(T @ G, np.eye(4), atol=1e-5)
    # and the correction must rescue the render: coherent drift is the
    # case the gauge metric is FOR (contrast: per-camera noise residual,
    # where it measurably hurts — see gauge_val_psnr's docstring)
    assert corrected > raw + 3.0, (raw, corrected)
    assert corrected > 13.0, corrected


def test_lowpass_registration_converges(barf_scene, tmp_path):
    """THE machinery proof: freeze a trained field, render self-consistent
    targets at the true poses (true pose = exact optimum by construction),
    inject 1 deg / 1% noise, and run Adam on the per-camera (r, t) deltas
    with LOW-PASS (BARF-annealed, alpha=2) rendering.  The aligned rotation
    error must drop well below the injected level — wide-basin registration
    through exp_map -> assemble_world_rays -> render works.  (At full PE
    the same loop walks into texture-aliased local minima; see
    experiments/r4/registration_probe.py and docs/QUALITY.md.)"""
    from dataclasses import replace
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from nerf_fl_tpu.models.poses import (all_poses, perturb_poses,
                                          pose_errors)
    from nerf_fl_tpu.training.optimizers import build_optimizer
    from nerf_fl_tpu.training.system import (assemble_world_rays,
                                             make_train_step, render_chunked)

    system = _train(_common(barf_scene, tmp_path, epochs=4)
                    + ['--pose_noise', '1e-12', '1e-12',  # camdir ray path
                       '--exp_name', 'reg'])
    # coarse-only nerfw loss (self-consistency needs a single head);
    # eval_variant => perturb = noise_std = 0: fully deterministic.
    cfg = replace(system.cfg.eval_variant(), N_importance=0,
                  refine_pose=True)
    anneal_ep = 5.0   # fork alpha = N_freqs/5 = 2 -> lowest band only

    rays = np.asarray(system.train_dataset.all_rays, np.float32)
    ts = np.asarray(system.train_dataset.all_ts, np.int32)
    idmap = (jnp.asarray(system.id_to_cam)
             if system.id_to_cam is not None else None)
    true = np.asarray(system.true_poses, np.float64)

    def params_at(poses):
        p = dict(system.params)
        lp = dict(p['learn_poses'])
        lp['init_c2w'] = jnp.asarray(np.asarray(poses, np.float32))
        lp['r'] = jnp.zeros_like(lp['r'])
        lp['t'] = jnp.zeros_like(lp['t'])
        p['learn_poses'] = lp
        return p

    world = assemble_world_rays(params_at(true), jnp.asarray(rays),
                                jnp.asarray(ts), ray_format=system.ray_format,
                                id_to_cam=idmap)
    res = render_chunked(params_at(true), np.asarray(world), ts, cfg,
                         chunk=4096, test_time=False, epoch=anneal_ep,
                         rng=jax.random.PRNGKey(7), keys=('rgb_coarse',))
    target = np.asarray(res['rgb_coarse'], np.float32)

    noisy = perturb_poses(true, 1.0, 0.01, seed=0)
    params = params_at(noisy)
    r_inj, _ = pose_errors(noisy, true, align=True)

    mask = jax.tree_util.tree_map(lambda _: False, params)
    mask['learn_poses'] = {k: (k in ('r', 't'))
                           for k in params['learn_poses']}
    tx = build_optimizer(SimpleNamespace(optimizer='adam', weight_decay=0.0,
                                         momentum=0.0))
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mask, loss_name=system.loss_name,
                           ray_format=system.ray_format,
                           id_to_cam=system.id_to_cam, donate=False)
    rng = jax.random.PRNGKey(0)
    order = np.random.default_rng(0).permutation(len(rays))
    B = 512
    for it in range(400):
        lo = (it * B) % (len(rays) - B)
        sel = order[lo:lo + B]
        batch = {'rays': jnp.asarray(rays[sel]), 'ts': jnp.asarray(ts[sel]),
                 'rgbs': jnp.asarray(target[sel])}
        rng, sub = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, batch,
                                    jnp.float32(1e-3),
                                    jnp.float32(anneal_ep), sub)
    refined = np.asarray(all_poses(params['learn_poses']))
    r_ref, _ = pose_errors(refined, true, align=True)
    print(f"[register] rot {r_inj:.3f} -> {r_ref:.3f} deg, "
          f"final loss {float(m['train/loss']):.2e}")
    assert float(m['train/loss']) < 1e-4          # descended to ~0
    assert r_ref < 0.75 * r_inj, (r_ref, r_inj)   # real convergence
    # measured: 1.02 -> ~0.61 deg at it=400, still falling


def test_barf_joint_training_bounded(barf_scene, tmp_path):
    """Joint field+pose contract at CPU scale: (a) pose noise must hurt,
    (b) --refine_pose with --pose_warmup_epochs/--pose_lr_mult must keep
    the pose error bounded (no white-collapse random walk: without warmup
    it measurably grows 2.0 -> 5.3 deg) and (c) end at least at the frozen
    control's quality.  Full recovery needs device-scale step counts —
    experiments/r4/barf_curve.py."""
    from nerf_fl_tpu.models.poses import all_poses, pose_errors

    common = _common(barf_scene, tmp_path)
    noise = ['--pose_noise', str(ROT_DEG), str(TRANS_FRAC)]

    s_clean = _train(common + ['--exp_name', 'clean'])
    s_ctrl = _train(common + noise + ['--exp_name', 'noisy_ctrl'])
    s_barf = _train(common + noise + [
        '--refine_pose', '--barf_schedule', 'paper',
        '--barf_epochs', '2', '8', '--pose_warmup_epochs', '2',
        '--pose_lr_mult', '0.25', '--exp_name', 'noisy_barf'])

    # the frozen control must NOT have moved its deltas
    assert float(np.abs(np.asarray(
        s_ctrl.params['learn_poses']['r'])).max()) == 0.0

    r_inj, t_inj = pose_errors(s_barf.init_poses, s_barf.true_poses)
    refined = np.asarray(all_poses(s_barf.params['learn_poses']))
    r_ref, t_ref = pose_errors(refined, s_barf.true_poses)

    _, p_clean, _ = s_clean.run_validation(epoch=11, max_images=2)
    _, p_ctrl, _ = s_ctrl.run_validation(epoch=11, max_images=2)
    _, p_barf, _ = s_barf.run_validation(epoch=11, max_images=2)
    print(f"[barf] rot {r_inj:.2f}->{r_ref:.2f} deg, trans "
          f"{t_inj:.4f}->{t_ref:.4f}; psnr clean {p_clean:.2f} / "
          f"ctrl {p_ctrl:.2f} / barf {p_barf:.2f}")
    # measured: rot 2.04->2.35, clean 18.53 / ctrl 17.11 / barf 17.47
    assert p_clean - p_ctrl > 0.5, (p_clean, p_ctrl)   # noise hurts
    assert r_ref < 1.35 * r_inj, (r_ref, r_inj)        # bounded, no walk
    assert t_ref < 1.35 * t_inj, (t_ref, t_inj)
    assert p_barf > p_ctrl - 0.15, (p_barf, p_ctrl)    # no quality cost

"""BARF end-to-end demonstration: pose-noise -> recovery (VERDICT r3 #3).

The reference grafted learned-pose refinement on as its main delta
(models/poses.py, utils/lie_group_helper.py:63-84) but never demonstrated
it works.  Protocol (BARF paper sec. 5): inject seeded SE(3) noise into
the init poses, train with --refine_pose, and show (a) the aligned pose
error shrinks well below the injected error, (b) val PSNR recovers toward
the clean-pose baseline, against a noisy-no-refine control.

The full-size curve (200^2 / 64+64 / TPU) lives in docs/QUALITY.md; this
is the reduced CPU version of the same three-arm experiment.
"""
import numpy as np
import pytest

from opt import get_opts
from nerf_fl_tpu.training.logging import NullLogger
from nerf_fl_tpu.training.system import NeRFSystem

pytestmark = pytest.mark.slow

ROT_DEG, TRANS_FRAC = 3.0, 0.02


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
    # more views than the default conftest fixture: pose recovery needs
    # cross-view constraints
    make_blender_scene(root, n_train=8, n_val=2, n_test=2, size=40)
    return root


def test_pose_noise_helpers_roundtrip():
    """perturb_poses injects the advertised magnitudes and pose_errors
    measures them back (aligned and raw)."""
    from nerf_fl_tpu.models.poses import perturb_poses, pose_errors
    from tests.fixtures import _look_at_pose
    true = np.stack([_look_at_pose(0.4 * i) for i in range(12)])
    noisy = perturb_poses(true, ROT_DEG, TRANS_FRAC, seed=0)
    r_raw, t_raw = pose_errors(noisy, true, align=False)
    assert 1.0 < r_raw < 8.0          # RMS 3 deg noise
    assert t_raw > 0.01
    # identical sets measure zero after alignment
    r0, t0 = pose_errors(true, true)
    assert r0 < 1e-6 and t0 < 1e-6
    # determinism
    np.testing.assert_array_equal(
        noisy, perturb_poses(true, ROT_DEG, TRANS_FRAC, seed=0))


def test_barf_recovers_injected_pose_noise(barf_scene, tmp_path):
    """Three arms, same seed/recipe: clean baseline, noisy no-refine
    control, noisy + --refine_pose.  Refinement must (a) cut the aligned
    pose error to below half the injected error, (b) recover most of the
    val-PSNR gap the noise opened."""
    from nerf_fl_tpu.models.poses import all_poses, pose_errors

    common = ['--root_dir', barf_scene, '--dataset_name', 'blender',
              '--img_wh', '40', '40', '--N_samples', '8',
              '--N_importance', '8', '--batch_size', '512',
              '--noise_std', '0', '--num_epochs', '10',
              '--lr_scheduler', 'cosine',
              '--save_path', str(tmp_path / 'ck'), '--refresh_every', '0']
    noise = ['--pose_noise', str(ROT_DEG), str(TRANS_FRAC)]

    s_clean = _train(common + ['--exp_name', 'clean'])
    s_ctrl = _train(common + noise + ['--exp_name', 'noisy_ctrl'])
    s_barf = _train(common + noise + ['--refine_pose',
                                      '--exp_name', 'noisy_barf'])

    # (a) pose error: injected vs refined (gauge-aligned)
    r_inj, t_inj = pose_errors(s_barf.init_poses, s_barf.true_poses)
    refined = np.asarray(all_poses(s_barf.params['learn_poses']))
    r_ref, t_ref = pose_errors(refined, s_barf.true_poses)
    # the frozen control must NOT have moved its deltas
    assert float(np.abs(np.asarray(
        s_ctrl.params['learn_poses']['r'])).max()) == 0.0
    assert r_ref < 0.5 * r_inj, (r_ref, r_inj)
    assert t_ref < 0.75 * t_inj, (t_ref, t_inj)

    # (b) PSNR: noisy control < refined ~ clean (val poses are clean, so
    # unrecovered pose error shows up directly)
    _, p_clean, _ = s_clean.run_validation(epoch=9, max_images=2)
    _, p_ctrl, _ = s_ctrl.run_validation(epoch=9, max_images=2)
    _, p_barf, _ = s_barf.run_validation(epoch=9, max_images=2)
    gap = p_clean - p_ctrl
    recovered = p_barf - p_ctrl
    print(f"[barf] rot {r_inj:.2f}->{r_ref:.2f} deg, trans "
          f"{t_inj:.4f}->{t_ref:.4f}; psnr clean {p_clean:.2f} / "
          f"ctrl {p_ctrl:.2f} / barf {p_barf:.2f}")
    assert gap > 0.5, (p_clean, p_ctrl)   # the noise must actually hurt
    assert recovered > 0.5 * gap, (p_clean, p_ctrl, p_barf)

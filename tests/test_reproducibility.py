"""Full-run determinism: identical seeds produce identical checkpoints
(explicit PRNG threading is a design claim — verify it end to end)."""
import glob
import os

import numpy as np

from opt import get_opts
from nerf_fl_tpu.training.logging import NullLogger
from nerf_fl_tpu.training.system import NeRFSystem
from nerf_fl_tpu.training import checkpoints


def run(blender_scene, save, seed):
    hp = get_opts(['--root_dir', blender_scene, '--dataset_name', 'blender',
                   '--img_wh', '40', '40', '--N_samples', '8',
                   '--N_importance', '8', '--batch_size', '512',
                   '--chunk', '4096', '--num_epochs', '1',
                   '--lr_scheduler', 'cosine', '--exp_name', 'repro',
                   '--save_path', save, '--seed', str(seed)])
    s = NeRFSystem(hp, logger=NullLogger())
    s.setup()
    s.configure()
    s.fit()
    return glob.glob(os.path.join(save, 'repro', '*.ckpt'))[0]


def _leaves(path):
    ck = checkpoints.load_checkpoint(path)

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k in sorted(node):
                yield from walk(node[k], f"{prefix}{k}.")
        else:
            yield prefix, np.asarray(node)

    return dict(walk(ck["state_dict"]))


def test_same_seed_bitwise_identical(blender_scene, tmp_path):
    c1 = run(blender_scene, str(tmp_path / "a"), seed=3)
    c2 = run(blender_scene, str(tmp_path / "b"), seed=3)
    l1, l2 = _leaves(c1), _leaves(c2)
    assert set(l1) == set(l2)
    for k in l1:
        np.testing.assert_array_equal(l1[k], l2[k], err_msg=k)


def test_different_seed_differs(blender_scene, tmp_path):
    c1 = run(blender_scene, str(tmp_path / "a"), seed=3)
    c3 = run(blender_scene, str(tmp_path / "c"), seed=4)
    l1, l3 = _leaves(c1), _leaves(c3)
    diff = any(not np.array_equal(l1[k], l3[k]) for k in l1)
    assert diff

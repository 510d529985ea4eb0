"""Multi-host (2-process) training: the same ('data',) mesh design
stretched over jax.distributed, gradients all-reduced across processes
(gloo on CPU here, ICI/DCN on a pod).

The subprocess job trains the tiny blender fixture end to end through the
real CLI (incl. steps_per_execution batching and sharded validation
renders with replicated outputs) and must reproduce the single-process
8-device run: identical global batch stream by construction
(RayBatcher host slicing), identical SPMD math up to float32 roundoff.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from opt import get_opts
from nerf_fl_tpu.training import checkpoints
from nerf_fl_tpu.training.logging import NullLogger
from nerf_fl_tpu.training.system import NeRFSystem

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_training_matches_single_process(blender_scene, tmp_path):
    port = 20000 + os.getpid() % 10000
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    save_mh = str(tmp_path / "mh")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(i), str(port), blender_scene, save_mh],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    # only process 0 writes the checkpoint
    ckpt_path = os.path.join(save_mh, "mh", "epoch=0.ckpt")
    assert os.path.exists(ckpt_path)
    mh = checkpoints.load_checkpoint(ckpt_path)

    # single-process ground truth: same flags on one 8-device process
    hp = get_opts(
        ['--root_dir', blender_scene, '--dataset_name', 'blender',
         '--img_wh', '40', '40', '--N_samples', '8', '--N_importance', '8',
         '--batch_size', '256', '--chunk', '4096', '--noise_std', '0',
         '--num_epochs', '1', '--lr_scheduler', 'cosine',
         '--num_gpus', '8', '--steps_per_execution', '3',
         '--exp_name', 'sp', '--save_path', str(tmp_path / "sp")])
    system = NeRFSystem(hp, logger=NullLogger())
    system.setup()
    system.configure()
    system.fit()

    # ---- resume-divergence guard: host 0 resumes from the checkpoint the
    # single-process run just wrote, host 1 starts fresh -> configure()
    # must fail loudly on BOTH processes instead of silently mixing states
    sp_ckpt = os.path.join(str(tmp_path / "sp"), "sp", "epoch=0.ckpt")
    assert os.path.exists(sp_ckpt)
    procs2 = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(i), str(port + 1), blender_scene,
             str(tmp_path / "mh_div")]
            + (["--ckpt_path", sp_ckpt] if i == 0 else []),
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs2 = [p.communicate(timeout=600)[0] for p in procs2]
    assert all(p.returncode != 0 for p in procs2), outs2
    assert any("differs across hosts" in o for o in outs2), outs2[0][-2000:]

    from flax import serialization
    mh_params = serialization.from_state_dict(system.params,
                                              mh["state_dict"])
    np.testing.assert_allclose(
        np.asarray(mh_params["nerf_coarse"]["xyz"][0]["w"]),
        np.asarray(system.params["nerf_coarse"]["xyz"][0]["w"]),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(mh_params["nerf_fine"]["dir"]["w"]),
        np.asarray(system.params["nerf_fine"]["dir"]["w"]),
        atol=5e-4)
    assert mh["global_step"] == system.global_step

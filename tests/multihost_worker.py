"""Subprocess worker for the multihost test: one training process of a
2-host CPU job (4 virtual devices each -> global mesh of 8).

Usage: python multihost_worker.py <host_index> <port> <scene> <save_path> \
           [extra train.py args...]
The caller must set XLA_FLAGS=--xla_force_host_platform_device_count=4 in
the environment BEFORE this interpreter starts.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

host_index, port, scene, save = (int(sys.argv[1]), sys.argv[2],
                                 sys.argv[3], sys.argv[4])
extra = sys.argv[5:]

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
import train  # noqa: E402
from opt import get_opts  # noqa: E402

train.main(get_opts(
    ['--root_dir', scene, '--dataset_name', 'blender',
     '--img_wh', '40', '40', '--N_samples', '8', '--N_importance', '8',
     '--batch_size', '256', '--chunk', '4096', '--noise_std', '0',
     '--num_epochs', '1', '--lr_scheduler', 'cosine',
     '--num_gpus', '8', '--num_hosts', '2', '--host_index', str(host_index),
     '--coordinator_address', f'localhost:{port}',
     '--steps_per_execution', '3',
     '--exp_name', 'mh', '--save_path', save] + extra))
print(f"worker {host_index} done", flush=True)

"""Multi-host (multi-process) SPMD support.

The reference is single-node only (Lightning DDP over local GPUs,
train.py:235-236).  Here multi-host is the same mesh design stretched over
processes: ``jax.distributed`` connects the hosts, ``jax.devices()``
becomes the GLOBAL device list (process-contiguous), `make_mesh` lays the
('data', 'model') mesh over it unchanged, and XLA routes the gradient
all-reduce over ICI within a host and DCN across hosts.

Host-side contract: every process loads the dataset and draws the SAME
global batch permutation (seeded identically), then materializes only its
contiguous 1/num_processes slice of each batch (`RayBatcher(host_index,
host_count)`); `global_batch` assembles the jax.Array whose addressable
shards are exactly that slice.  Only process 0 writes checkpoints and
logs; validation renders replicate their (small) pixel outputs across
hosts so every process can assemble the frame.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: str, num_hosts: int,
                           host_index: int) -> None:
    """Connect this process to the multi-host job.

    Must run before any JAX backend use.  On TPU pods the three arguments
    can usually be omitted entirely (the TPU runtime provides them); they
    are explicit here so CPU/GPU clusters and tests can drive it too.
    """
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_hosts,
                               process_id=host_index)


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_batch(mesh: Mesh, batch: Any, axis: int = 0) -> Any:
    """Assemble global sharded arrays from per-process local batch slices.

    Every leaf's ``axis`` dimension holds this process's contiguous
    1/process_count slice of the global batch (the RayBatcher host-shard
    contract); the returned jax.Arrays have the full global batch
    dimension, sharded over the mesh 'data' axis.  Requires the 'data'
    axis to be laid out process-contiguously, which `make_mesh` guarantees
    (it reshapes ``jax.devices()``, whose order is by process index).
    """
    from .mesh import batch_sharding
    n = jax.process_count()
    sharding = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        shape = list(x.shape)
        shape[axis] *= n
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(shape))

    return jax.tree_util.tree_map(put, batch)

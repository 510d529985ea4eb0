"""Host->device ray feed.

Replaces the reference's torch DataLoader machinery (train.py:144-156, 4
workers + pin_memory) with the TPU-native shape: the train split is already a
flat ray buffer in host RAM (the reference pre-bakes it too), so a "batch" is
a vectorized random gather — no worker processes, no collation.  Batches are
tiny (batch_size x 9 floats); JAX's async dispatch overlaps the host gather
with device compute, and `shard_batch` places the batch axis over the 'data'
mesh axis for multi-chip runs.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class RayBatcher:
    """Shuffled-epoch batch iterator over flat (rays, ts, rgbs) buffers."""

    def __init__(self, rays: np.ndarray, ts: np.ndarray, rgbs: np.ndarray,
                 batch_size: int, seed: int = 0, drop_last: bool = True,
                 host_index: int = 0, host_count: int = 1):
        """``batch_size`` is the GLOBAL batch; with ``host_count`` > 1 every
        process draws the same seeded permutation and materializes only its
        contiguous batch_size/host_count slice (the multihost data
        contract, parallel/multihost.py)."""
        assert len(rays) == len(ts) == len(rgbs)
        if batch_size % host_count:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"host_count {host_count}")
        if host_count > 1 and not drop_last:
            # a short tail batch would slice to different lengths on
            # different hosts -> inconsistent global shapes across processes
            raise ValueError("drop_last=False is not supported with "
                             "host-sharded batching")
        self.rays, self.ts, self.rgbs = rays, ts, rgbs
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.host_index = host_index
        self.host_count = host_count
        self.n = len(rays)

    def steps_per_epoch(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic shuffle per epoch (torch DataLoader(shuffle=True)
        analog, but reproducible)."""
        # [seed, epoch] pair seeding (not seed+epoch, which collides across
        # runs); MUST stay in lockstep with training.system.epoch_perm —
        # the device-pool path draws this exact permutation
        rng = np.random.default_rng([self.seed, epoch_idx])
        perm = rng.permutation(self.n)
        B = self.batch_size
        lo = self.host_index * B // self.host_count
        hi = (self.host_index + 1) * B // self.host_count
        stop = self.n - (self.n % B) if self.drop_last else self.n
        for i in range(0, stop, B):
            idx = perm[i:i + B][lo:hi]
            yield {"rays": self.rays[idx], "ts": self.ts[idx],
                   "rgbs": self.rgbs[idx]}

    def sample(self, rng: np.random.Generator,
               batch_size: Optional[int] = None) -> Dict[str, np.ndarray]:
        """IID random batch (used by the benchmark harness)."""
        B = batch_size or self.batch_size
        idx = rng.integers(0, self.n, size=B)
        return {"rays": self.rays[idx], "ts": self.ts[idx],
                "rgbs": self.rgbs[idx]}

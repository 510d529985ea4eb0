"""Learned per-camera pose refinement (BARF / nerfmm-style).

Semantics follow reference models/poses.py:9-34: per-camera so(3) + R^3 delta
parameters composed onto a frozen initial c2w via the exponential map.  The
reference evaluates one camera at a time in a Python loop (train.py:86); here
``all_poses`` computes every camera's pose in one batched XLA program, and the
per-ray pose is a gather — this is what lets pose refinement live inside the
jitted train step.

Fixes a fork bug noted in SURVEY.md section 2.5: the reference sizes LearnPose
by the number of unique *cameras* but indexes it by *image* order
(train.py:135 vs :86); here the table is sized by the number of images.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core.lie import make_c2w


def init_learn_pose(num_cams: int, init_c2w: np.ndarray | None = None) -> Dict:
    """Parameter pytree: zero deltas (reference poses.py:23-24) plus the frozen
    init poses carried alongside (marked non-trainable by the optimizer mask).

    Args:
      init_c2w: (N, 4, 4) initial camera-to-world matrices (or None).
    """
    p = {
        "r": jnp.zeros((num_cams, 3), jnp.float32),
        "t": jnp.zeros((num_cams, 3), jnp.float32),
    }
    if init_c2w is not None:
        p["init_c2w"] = jnp.asarray(init_c2w, jnp.float32)
    return p


def all_poses(params: Dict) -> jnp.ndarray:
    """(N, 4, 4) refined c2w for every camera, batched (poses.py:26-34)."""
    c2w = make_c2w(params["r"], params["t"])
    if "init_c2w" in params:
        c2w = c2w @ params["init_c2w"]
    return c2w


def pose_for(params: Dict, cam_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-ray (..., 4, 4) poses gathered by camera/image index."""
    return jnp.take(all_poses(params), cam_ids, axis=0)

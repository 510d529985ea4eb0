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


# ----------------------------------------------------------------------
# Pose-noise / pose-error harness (host-side NumPy).  The BARF protocol
# (paper sec. 5): perturb the init poses, train with refinement, report
# rotation/translation error before vs after.  The reference ships its
# pose refinement with no such check.
# ----------------------------------------------------------------------

def _rodrigues(rotvec: np.ndarray) -> np.ndarray:
    """(N, 3) rotation vectors -> (N, 3, 3) rotation matrices."""
    theta = np.linalg.norm(rotvec, axis=-1, keepdims=True)
    axis = rotvec / np.maximum(theta, 1e-12)
    K = np.zeros(rotvec.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -axis[..., 2], axis[..., 1]
    K[..., 1, 0], K[..., 1, 2] = axis[..., 2], -axis[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -axis[..., 1], axis[..., 0]
    th = theta[..., None]
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def perturb_poses(init_c2w: np.ndarray, rot_deg: float, trans_frac: float,
                  seed: int = 0) -> np.ndarray:
    """Seeded SE(3) noise LEFT-composed onto (N, 4, 4) c2w matrices — the
    same composition the learned deltas use (all_poses: exp(r,t) @ init),
    so the injected error is exactly representable by the refinement.

    rot_deg is the RMS rotation angle in degrees; trans_frac scales the
    translation sigma by each camera's distance from the origin."""
    rng = np.random.default_rng([seed, 17])
    init_c2w = np.asarray(init_c2w, np.float64)
    n = len(init_c2w)
    rotvec = np.deg2rad(rot_deg) * rng.standard_normal((n, 3)) / np.sqrt(3)
    dist = np.linalg.norm(init_c2w[:, :3, 3], axis=1, keepdims=True)
    tn = trans_frac * dist * rng.standard_normal((n, 3))
    delta = np.tile(np.eye(4), (n, 1, 1))
    delta[:, :3, :3] = _rodrigues(rotvec)
    delta[:, :3, 3] = tn
    return (delta @ init_c2w).astype(np.float32)


def gauge_transform(pred_c2w: np.ndarray, true_c2w: np.ndarray) -> np.ndarray:
    """Rigid (4, 4) world transform T minimizing ||T @ pred - true|| over
    the camera centers (Procrustes / Umeyama without scale).

    Joint pose+scene refinement is defined only up to a global SE(3) gauge:
    the refined scene lives in its own drifted world frame.  T maps that
    frame back to the true-pose frame, so rendering a true-frame camera
    inside the refined scene uses ``inv(T) @ c2w`` — the BARF-paper
    evaluation protocol (sec. 5 aligns poses / optimizes test poses before
    scoring for exactly this reason)."""
    pred = np.asarray(pred_c2w, np.float64)[:, :3, :4]
    true = np.asarray(true_c2w, np.float64)[:, :3, :4]
    cp, ct = pred[:, :, 3], true[:, :, 3]
    mp, mt = cp.mean(0), ct.mean(0)
    H = (cp - mp).T @ (ct - mt)
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    Rg = Vt.T @ D @ U.T
    T = np.eye(4)
    T[:3, :3] = Rg
    T[:3, 3] = mt - Rg @ mp
    return T


def pose_errors(pred_c2w: np.ndarray, true_c2w: np.ndarray,
                align: bool = True):
    """(mean rotation error deg, mean camera-center error) between two
    (N, >=3, 4) pose sets, optionally after rigid Procrustes alignment of
    the camera centers — joint pose+scene refinement is defined only up to
    a global gauge, so raw errors overstate the residual (BARF sec. 5
    evaluates after alignment too)."""
    pred = np.asarray(pred_c2w, np.float64)[:, :3, :4]
    true = np.asarray(true_c2w, np.float64)[:, :3, :4]
    Rp, cp = pred[:, :, :3], pred[:, :, 3]
    Rt, ct = true[:, :, :3], true[:, :, 3]
    if align and len(pred) >= 3:
        T = gauge_transform(pred, true)
        Rg, tg = T[:3, :3], T[:3, 3]
        Rp = Rg[None] @ Rp
        cp = cp @ Rg.T + tg
    rel = Rp @ np.swapaxes(Rt, 1, 2)
    cosang = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot_deg = float(np.rad2deg(np.arccos(cosang)).mean())
    trans = float(np.linalg.norm(cp - ct, axis=1).mean())
    return rot_deg, trans

"""Ray-geometry primitives (JAX device-side).

Semantics follow the reference ``datasets/ray_utils.py`` (see
/root/reference/datasets/ray_utils.py:5-98): pixel-corner convention (no +0.5
pixel centering), OpenGL-style camera frame with -z forward, and the
forward-facing NDC warp.  NumPy twins used by the host data pipeline live in
``nerf_fl_tpu.data.rays_np``.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_ray_directions(H: int, W: int, K) -> jnp.ndarray:
    """Per-pixel ray directions in the camera frame.

    Matches reference ray_utils.py:5-26: ``[(i-cx)/fx, -(j-cy)/fy, -1]`` with a
    non-centered pixel grid (i = column, j = row).

    Args:
      H, W: image height and width (static).
      K: (3, 3) intrinsics.

    Returns:
      (H, W, 3) float32 directions (unnormalized).
    """
    K = jnp.asarray(K, jnp.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Rotate camera-frame directions into the world frame and normalize.

    Matches reference ray_utils.py:29-55, including its support for a single
    shared pose or one pose per ray (the pose-refinement path, train.py:95-96).

    Args:
      directions: (N, 3) camera-frame directions (flattened pixels).
      c2w: (3, 4) shared pose or (N, 3, 4) per-ray poses.

    Returns:
      rays_o, rays_d: each (N, 3); rays_d is unit-norm.
    """
    directions = directions.reshape(-1, 3)
    if c2w.ndim == 2:
        rot = c2w[:3, :3]  # (3, 3)
        rays_d = directions @ rot.T
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    else:
        rot = c2w[:, :3, :3]  # (N, 3, 3)
        rays_d = jnp.einsum("nc,nrc->nr", directions, rot)
        rays_o = c2w[:, :3, 3]
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


def get_ndc_rays(H: int, W: int, focal: float, near, rays_o, rays_d):
    """Warp world-space rays into NDC for unbounded forward-facing scenes.

    Matches reference ray_utils.py:58-98 (bmild ndc_derivation.pdf).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)

"""Image quality metrics (reference metrics.py:4-20).

``ssim`` reimplements kornia's windowed SSIM (gaussian 1.5-sigma window,
window size 3, data range 1) in pure JAX via depthwise convolution — the
reference maps kornia's DSSIM through ``1 - 2*dssim`` into [-1, 1].
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


def mse(image_pred, image_gt, valid_mask: Optional[jnp.ndarray] = None,
        reduction: str = "mean"):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        if reduction == "mean":
            m = valid_mask.astype(value.dtype)
            if m.ndim < value.ndim:
                m = m[..., None]
            m = jnp.broadcast_to(m, value.shape)
            return jnp.sum(value * m) / jnp.maximum(jnp.sum(m), 1.0)
        value = value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_pred, image_gt, valid_mask: Optional[jnp.ndarray] = None,
         reduction: str = "mean"):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    """Computed host-side in float64 (it's a tiny compile-time constant):
    f32 coefficient error (~1e-8) is amplified up to 1/C2 ~ 1e3 through the
    variance terms in near-flat patches — enough to move SSIM by ~2e-5."""
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / np.sum(g)
    return np.outer(g, g)  # callers cast to the compute dtype


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D filter with reflect padding (kornia's default).
    img: (B, C, H, W)."""
    B, C, H, W = img.shape
    k = kernel.shape[0]
    pad = k // 2
    img = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kern = jnp.broadcast_to(kernel[None, None], (C, 1, k, k))
    return lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)


def ssim(image_pred, image_gt, window_size: int = 3, reduction: str = "mean",
         max_val: float = 1.0):
    """SSIM in [-1, 1] matching reference metrics.py:15-20.

    Args:
      image_pred, image_gt: (B, C, H, W) in [0, 1].
    """
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    image_pred = jnp.asarray(image_pred)
    image_gt = jnp.asarray(image_gt, image_pred.dtype)
    # window in the images' dtype (f64 inputs under enable_x64 must stay f64
    # end to end — the golden-value test runs the formula at full precision)
    window = _gaussian_window(window_size, 1.5).astype(image_pred.dtype)

    mu1 = _filter2d(image_pred, window)
    mu2 = _filter2d(image_gt, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(image_pred * image_pred, window) - mu1_sq
    sigma2_sq = _filter2d(image_gt * image_gt, window) - mu2_sq
    sigma12 = _filter2d(image_pred * image_gt, window) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if reduction == "mean":
        ssim_map = jnp.mean(ssim_map)
    # kornia dssim = (1 - ssim)/2; reference returns 1 - 2*dssim = ssim
    return ssim_map

"""Image quality metrics: MSE / PSNR / SSIM.

Matches the reference eval metrics (utils/metric.py:10-30): PSNR over the
raw [0,1] rgb; SSIM via kornia's `ssim_loss(window=3)` convention, where the
reported value is 1 - 2 * dssim = mean SSIM map. The SSIM window is the
3x3 gaussian (sigma = 1.5) kornia uses, computed with valid padding.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mse(pred: jnp.ndarray, gt: jnp.ndarray, valid_mask=None):
    v = (pred - gt) ** 2
    if valid_mask is not None:
        v = v[valid_mask]
    return v.mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, valid_mask=None):
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(
    pred: jnp.ndarray,  # (H, W, 3) in [0, 1]
    gt: jnp.ndarray,
    window_size: int = 3,
    max_val: float = 1.0,
    sigma: float = 1.5,
):
    """Mean SSIM, kornia-equivalent of the reference's
    `1 - 2 * ssim_loss(pred, gt, 3)` (utils/metric.py:23-30)."""
    kernel = jnp.asarray(_gaussian_kernel(window_size, sigma), jnp.float32)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2

    pad = window_size // 2

    def filt(x):  # (H, W, C) -> same-size conv, reflect border (kornia
        # filter2d default border_type='reflect')
        from jax import lax

        x = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
        k = kernel[None, None]
        # fp32 conv is essential: with the TPU default (bf16) the variance
        # terms E[x^2] - mu^2 cancel catastrophically and SSIM denominators
        # near C2 go negative (observed |SSIM| >> 1 on real renders)
        y = lax.conv_general_dilated(
            x, k, (1, 1), "VALID", precision=lax.Precision.HIGHEST
        )
        return jnp.moveaxis(y[:, 0], 0, -1)

    mu_p = filt(pred)
    mu_g = filt(gt)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sigma_pp = filt(pred * pred) - mu_pp
    sigma_gg = filt(gt * gt) - mu_gg
    sigma_pg = filt(pred * gt) - mu_pg

    num = (2 * mu_pg + C1) * (2 * sigma_pg + C2)
    den = (mu_pp + mu_gg + C1) * (sigma_pp + sigma_gg + C2)
    return (num / den).mean()

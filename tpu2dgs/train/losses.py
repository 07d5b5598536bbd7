"""Training losses: L1, SSIM, normal consistency, depth distortion.

Reference: utils/loss_utils.py (L1 line 17, 11x11 sigma-1.5 gaussian-window
SSIM lines 23-73) and the composite objective of train.py:73-85. Images are
(C,H,W) float32 in [0,1] as in the reference contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    # numpy on purpose: a cached jnp computation would leak tracers across
    # jit boundaries; as a numpy constant it embeds safely in any trace.
    x = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)  # (W,)


def _filter2d_separable(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D gaussian blur of (C,H,W) via two separable 1D passes
    (mathematically equal to the reference's dense 11x11 depthwise conv2d,
    utils/loss_utils.py:53-63). Each pass is an unrolled weighted sum of
    static shifted slices: single-channel convs lower to a degenerate TPU
    conv path (~10x slower, measured), while shifted adds are pure VPU."""
    k = window.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)))
    h = img.shape[1]
    x = sum(float(window[i]) * x[:, i:i + h, :] for i in range(k))
    w = img.shape[2]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    return sum(float(window[i]) * x[:, :, i:i + w] for i in range(k))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a (C,H,W) pair — reference utils/loss_utils.py:43-73
    (C1/C2 constants 0.01^2 / 0.03^2, same-padding window)."""
    window = _gaussian_window(window_size, sigma)
    mu1 = _filter2d_separable(img1, window)
    mu2 = _filter2d_separable(img2, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_separable(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d_separable(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d_separable(img1 * img2, window) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(image, gt, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM) — reference train.py:73-74."""
    ll1 = l1_loss(image, gt)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt)), ll1


def normal_consistency_loss(rend_normal, surf_normal):
    """mean(1 - <n_render, n_surf>) over pixels — train.py:83-84.
    Inputs (3,H,W) world-space; rend_normal is alpha-weighted (unnormalized)
    exactly as the reference consumes it."""
    return jnp.mean(1.0 - jnp.sum(rend_normal * surf_normal, axis=0))


def distortion_loss(rend_dist):
    """mean of the per-pixel accumulated distortion map — train.py:85."""
    return jnp.mean(rend_dist)


def psnr(img1, img2):
    """Reference utils/image_utils.py:19 (per-image MSE over flattened CHW)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))

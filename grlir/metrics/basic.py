"""PSNR / SSIM / PSNR-B as pure jittable functions on NHWC batches.

Numerics match the reference metric classes (utils/metrics/{psnr,ssim,psnrb}.py):
per-image values (no batch averaging here — multi-host dedup averaging happens in
grlir.metrics.collect), SSIM with the 6-decimal-rounded gaussian window and
zero-padded SAME convolution, PSNR-B with the 8px blocking-effect factor.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grlir.utils.image import rgb2ycbcr


def psnr(pred, target):
    """(B, H, W, C) -> (B,).  -10*log10(mse) (psnr.py:45-49)."""
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return -10.0 * jnp.log10(mse)


def _to_y(img, data_range: float):
    """RGB -> rounded Y channel; 1-channel input passes through unchanged so
    the *_y metrics degrade to their plain variants on grayscale images
    (reference gray metric sets simply omit the _y metrics)."""
    if img.shape[-1] == 1:
        return img
    return rgb2ycbcr(img, data_range)


def psnr_y(pred, target, data_range: float = 1.0):
    return psnr(_to_y(pred, data_range), _to_y(target, data_range))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # reference rounds each tap to 6 decimals before normalizing (ssim.py:18-24)
    k = np.array(
        [
            round(math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)), 6)
            for x in range(window_size)
        ]
    )
    k = k / k.sum()
    return np.outer(k, k).astype(np.float32)


def _ssim_filter(x, window):
    """Depthwise 2-D conv with zero SAME padding, NHWC."""
    C = x.shape[-1]
    w = jnp.asarray(window)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, C))  # HWIO with feature groups = C
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(pred, target, window_size: int = 11):
    """(B, H, W, C) -> (B,).  Matches reference _ssim (ssim.py:36-74)."""
    window = _gaussian_window(window_size)
    mu1 = _ssim_filter(pred, window)
    mu2 = _ssim_filter(target, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _ssim_filter(pred * pred, window) - mu1_sq
    sigma2_sq = _ssim_filter(target * target, window) - mu2_sq
    sigma12 = _ssim_filter(pred * target, window) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_y(pred, target, data_range: float = 1.0):
    return ssim(_to_y(pred, data_range), _to_y(target, data_range))


def _blocking_effect_factor(im):
    """(B, H, W, 1) -> (B,).  psnrb.py:22-101, block size 8."""
    B, H, W, _ = im.shape
    block = 8
    hb = np.arange(7, W - 1, 8)
    vb = np.arange(7, H - 1, 8)
    hn = np.setdiff1d(np.arange(0, W - 1), hb)
    vn = np.setdiff1d(np.arange(0, H - 1), vb)

    def diff2(a, positions, axis):
        x1 = jnp.take(a, positions, axis=axis)
        x2 = jnp.take(a, positions + 1, axis=axis)
        return jnp.sum((x1 - x2) ** 2, axis=(1, 2, 3))

    h_block = diff2(im, hb, 2)
    v_block = diff2(im, vb, 1)
    h_non = diff2(im, hn, 2)
    v_non = diff2(im, vn, 1)

    n_bh = H * (W // block - 1)
    n_bv = W * (H // block - 1)
    boundary = (h_block + v_block) / (n_bh + n_bv)
    n_nh = H * (W - 1) - n_bh
    n_nv = W * (H - 1) - n_bv
    nonboundary = (h_non + v_non) / (n_nh + n_nv)

    scaler = np.log2(block) / np.log2(min(H, W))
    bef = scaler * (boundary - nonboundary)
    return jnp.where(boundary <= nonboundary, 0.0, bef)


def psnrb(pred, target):
    """(B, H, W, C) -> (B,).  Per-channel 10*log10(1/(mse+bef)) mean (psnrb.py:104-114).

    NB the reference computes BEF on the *restored* image (named `input`)."""
    total = 0.0
    C = pred.shape[-1]
    for c in range(C):
        p = pred[..., c: c + 1]
        t = target[..., c: c + 1]
        mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
        bef = _blocking_effect_factor(p)
        total = total + 10.0 * jnp.log10(1.0 / (mse + bef))
    return total / C


def psnrb_y(pred, target, data_range: float = 1.0):
    return psnrb(_to_y(pred, data_range), _to_y(target, data_range))

"""Imaging utilities on NHWC arrays (jax.numpy in, jax.numpy out).

Numeric semantics match /root/reference/utils/utils_image.py so computed metrics
are comparable digit-for-digit with the reference evaluation pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MATLAB ITU-R BT.601 ycbcr matrix (utils_image.py:43-79)
_YCBCR_ROT = (
    np.array(
        [
            [65.481, -37.797, 112.0],
            [128.553, -74.203, -93.786],
            [24.966, 112.0, -18.214],
        ]
    )
    / 255.0
)
_YCBCR_OFF = np.array([16.0, 128.0, 128.0])


def shave(img, border: int):
    """Crop `border` pixels from each spatial edge (utils_image.py:8-11). NHWC."""
    if border > 0:
        img = img[..., border:-border, border:-border, :]
    return img


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H/W to multiples of scale (utils_image.py:14-27). HWC or HW numpy."""
    img = np.copy(img)
    H, W = img.shape[:2]
    return img[: H - H % scale, : W - W % scale, ...]


def tensor_round(img, data_range: float = 1.0):
    """Quantize to the representable 1/255 grid (utils_image.py:30-33)."""
    img = jnp.clip(img, 0.0, 1.0 * data_range)
    img = jnp.round(img * 255.0 / data_range)
    return img * data_range / 255.0


def to_uint8(img, data_range: float = 1.0) -> np.ndarray:
    img = np.clip(np.asarray(img), 0, data_range)
    return np.uint8(np.round(img * 255.0 / data_range))


def rgb2ycbcr(img, data_range: float = 1.0, only_y: bool = True):
    """MATLAB-compatible RGB->YCbCr with integer rounding (utils_image.py:43-79).

    NHWC float input in [0, data_range]; output on the same scale.  The round()
    is part of the reference metric semantics (PSNR-Y/SSIM-Y operate on the
    rounded Y channel).
    """
    x = img
    if data_range == 1.0:
        x = x * 255.0
    x = x @ jnp.asarray(_YCBCR_ROT, x.dtype) + jnp.asarray(_YCBCR_OFF, x.dtype)
    x = jnp.round(x)
    if only_y:
        x = x[..., :1]
    if data_range == 1.0:
        x = x / 255.0
    return x

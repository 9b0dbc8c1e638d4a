"""Task degradation physics: dn / jpeg / dm / db.

Host-side parts (numpy/cv2, run in the data pipeline) reproduce the reference
datasets bit-for-bit — including RNG details the eval parity depends on:
  - val denoise noise seeded by sha256(filename) and drawn in CHW order
    (restoration_dn.py:127-142)
  - val deblur AWGN with np.random.seed(0), CHW order (restoration_db.py:40-43)
  - JPEG via cv2 imencode/imdecode (restoration_jpeg.py:63-79)

Device-side parts (jax, run inside the jitted train/eval step like the reference
runs them on GPU in engine.forward, engines/base.py:118-142):
  - dm_matlab MATLAB demosaicking as grouped 5x5 convs (utils_mosaic.py:36-111)
  - kernel-blur synthesis conv2d(target, kernel) + noise (engines/base.py:131-142)
"""

from __future__ import annotations

import os
from hashlib import sha256
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


# ---------------------------------------------------------------- denoising

def train_noise(rng: np.random.Generator, shape_hwc, sigma: float = 0.0,
                sigma_range: Sequence[float] = ()) -> Tuple[np.ndarray, float]:
    """Fresh AWGN for a training sample; sigma in [0,255] units."""
    if len(sigma_range) > 0:
        sigma = rng.uniform(*sigma_range)
    s = sigma / 255.0
    return (rng.standard_normal(shape_hwc) * s).astype(np.float32), s


def val_noise(filename: str, shape_hwc, sigma: float) -> np.ndarray:
    """Deterministic val noise: sha256(stem)-seeded RandomState, drawn in CHW
    order exactly like the reference (restoration_dn.py:135-141)."""
    h, w, c = shape_hwc
    img_name = os.path.basename(filename).split("_")[0]
    seed = np.frombuffer(sha256(img_name.encode("utf-8")).digest(), dtype="uint32")
    rstate = np.random.RandomState(seed)
    noise = rstate.normal(0, sigma / 255.0, (c, h, w))
    return noise.transpose(1, 2, 0).astype(np.float32)


def noise_level_map(shape_hw, level: float) -> np.ndarray:
    """Constant noise-level-map channel (restoration_dn.py:144-147)."""
    return np.full((*shape_hw, 1), level, np.float32)


# ---------------------------------------------------------------- JPEG

def jpeg_compress(img_uint8: np.ndarray, quality_factor: int) -> np.ndarray:
    """cv2 JPEG round-trip on an RGB (H,W,3) or grayscale (H,W,1) uint8 image."""
    import cv2

    enc = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality_factor)]
    if img_uint8.ndim == 3 and img_uint8.shape[2] == 3:
        bgr = cv2.cvtColor(img_uint8, cv2.COLOR_RGB2BGR)
        _, buf = cv2.imencode(".jpg", bgr, enc)
        out = cv2.imdecode(buf, 1)
        return cv2.cvtColor(out, cv2.COLOR_BGR2RGB)
    _, buf = cv2.imencode(".jpg", img_uint8[..., 0], enc)
    return cv2.imdecode(buf, 0)[..., np.newaxis]


# ---------------------------------------------------------------- demosaicking

def mosaic_cfa_bayer(rgb_uint8: np.ndarray):
    """RGGB mosaic; returns (CFA (H,W), CFA4 (H/2,W/2,4) packed) as uint8
    (utils_mosaic.py:124-147)."""
    H, W = rgb_uint8.shape[:2]
    mask = np.zeros((H, W, 3), bool)
    mask[0::2, 0::2, 0] = True  # R
    mask[0::2, 1::2, 1] = True  # G
    mask[1::2, 0::2, 1] = True  # G
    mask[1::2, 1::2, 2] = True  # B
    cfa = (mask * rgb_uint8).sum(2).astype(np.uint8)
    cfa4 = np.zeros((H // 2, W // 2, 4), np.uint8)
    cfa4[:, :, 0] = cfa[0::2, 0::2]
    cfa4[:, :, 1] = cfa[0::2, 1::2]
    cfa4[:, :, 2] = cfa[1::2, 0::2]
    cfa4[:, :, 3] = cfa[1::2, 1::2]
    return cfa, cfa4


def _dm_kernels() -> np.ndarray:
    """The 4 Malvar demosaic kernels, (4, 5, 5) (utils_mosaic.py:44-85)."""
    kgrb = np.array(
        [[0, 0, -1, 0, 0],
         [0, 0, 2, 0, 0],
         [-1, 2, 4, 2, -1],
         [0, 0, 2, 0, 0],
         [0, 0, -1, 0, 0]], np.float32) / 8
    krbg0 = np.array(
        [[0, 0, 0.5, 0, 0],
         [0, -1, 0, -1, 0],
         [-1, 4, 5, 4, -1],
         [0, -1, 0, -1, 0],
         [0, 0, 0.5, 0, 0]], np.float32) / 8
    krbg1 = krbg0.T
    krbbr = np.array(
        [[0, 0, -1.5, 0, 0],
         [0, 2, 0, 2, 0],
         [-1.5, 0, 6, 0, -1.5],
         [0, 2, 0, 2, 0],
         [0, 0, -1.5, 0, 0]], np.float32) / 8
    return np.stack([kgrb, krbg0, krbg1, krbbr])


def dm_matlab(cfa4: jnp.ndarray) -> jnp.ndarray:
    """MATLAB (Malvar) demosaicking init, jittable.

    cfa4: (B, H/2, W/2, 4) packed RGGB -> (B, H, W, 3) RGB
    (utils_mosaic.py:36-111, device-side per engines/base.py:127-128).
    """
    B, h2, w2, _ = cfa4.shape
    H, W = h2 * 2, w2 * 2
    # unpack to full-resolution single-channel CFA
    cfa = jnp.zeros((B, H, W, 1), cfa4.dtype)
    cfa = cfa.at[:, 0::2, 0::2, 0].set(cfa4[..., 0])
    cfa = cfa.at[:, 0::2, 1::2, 0].set(cfa4[..., 1])
    cfa = cfa.at[:, 1::2, 0::2, 0].set(cfa4[..., 2])
    cfa = cfa.at[:, 1::2, 1::2, 0].set(cfa4[..., 3])

    pad = jnp.pad(cfa, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    k = jnp.asarray(_dm_kernels()).transpose(1, 2, 0)[:, :, None, :]  # HWIO (5,5,1,4)
    conv = jax.lax.conv_general_dilated(
        pad, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W, 4)

    r = cfa[..., 0]
    g = cfa[..., 0]
    b = cfa[..., 0]
    # start from replicated CFA then fill interpolated sites
    # G channel
    g = g.at[:, 0::2, 0::2].set(conv[:, 0::2, 0::2, 0])
    g = g.at[:, 1::2, 1::2].set(conv[:, 1::2, 1::2, 0])
    # R channel
    r = r.at[:, 0::2, 1::2].set(conv[:, 0::2, 1::2, 1])
    r = r.at[:, 1::2, 0::2].set(conv[:, 1::2, 0::2, 2])
    r = r.at[:, 1::2, 1::2].set(conv[:, 1::2, 1::2, 3])
    # B channel
    b = b.at[:, 0::2, 1::2].set(conv[:, 0::2, 1::2, 2])
    b = b.at[:, 1::2, 0::2].set(conv[:, 1::2, 0::2, 1])
    b = b.at[:, 0::2, 0::2].set(conv[:, 0::2, 0::2, 3])

    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------- kernel deblur

def get_blur_kernel(kernel_type: str = "gaussian") -> np.ndarray:
    """(kh, kw) float32, already flipped like the reference
    (utils_deblur.py:116-129: np.flip before conv2d so correlation == true conv)."""
    if kernel_type == "gaussian":
        k = _fspecial_gaussian(25, 1.6)
    elif "real" in kernel_type:
        path = os.path.join(ASSET_DIR, "Levin09.npy")
        with open(path, "rb") as f:
            k = np.load(f, allow_pickle=True)[0, int(kernel_type[-1]) - 1]
    else:
        raise ValueError(kernel_type)
    return np.flip(k.astype(np.float32)).copy()


def _fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') (utils_deblur.py:54-65)."""
    siz = (hsize - 1.0) / 2.0
    x, y = np.meshgrid(np.arange(-siz, siz + 1), np.arange(-siz, siz + 1))
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    return h / s if s != 0 else h


def apply_blur(target: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Grouped conv2d(target, kernel) with zero SAME padding, NHWC, jittable
    (engines/base.py:131-142)."""
    kh, kw = kernel.shape
    C = target.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        target, k, (1, 1),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def db_forward(noise: jnp.ndarray, target: jnp.ndarray, kernel: np.ndarray,
               training: bool):
    """Deblur input synthesis: lq = blur(gt) + noise; training additionally crops
    the kernel support border from both (engines/base.py:131-142)."""
    bkh, bkw = kernel.shape[0] // 2, kernel.shape[1] // 2
    lq = noise + apply_blur(target, kernel)
    if training:
        lq = lq[:, bkh:-bkh, bkw:-bkw, :]
        target = target[:, bkh:-bkh, bkw:-bkw, :]
    return lq, target

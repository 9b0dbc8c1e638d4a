"""Parity tests: MATLAB imresize + task degradation physics vs the reference."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

import oracle
from grlir.data import degradations as D
from grlir.utils.matlab import imresize


@pytest.mark.parametrize("scale", [0.5, 0.25, 1 / 3, 2.0, 1.7])
@pytest.mark.parametrize("shape", [(32, 48, 3), (37, 41, 3), (24, 24)])
def test_imresize_matches_reference(rng, scale, shape):
    ref = oracle.reference_module("utils.matlab_functions")
    img = rng.random(shape).astype(np.float32)
    want = ref.imresize(img, scale, antialiasing=True)
    got = imresize(img, scale, antialiasing=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_imresize_no_antialiasing(rng):
    ref = oracle.reference_module("utils.matlab_functions")
    img = rng.random((40, 40, 3)).astype(np.float32)
    want = ref.imresize(img, 0.5, antialiasing=False)
    got = imresize(img, 0.5, antialiasing=False)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_mosaic_matches_reference(rng):
    ref = oracle.reference_module("utils.utils_mosaic")
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    want_cfa, want_cfa4, _, _ = ref.mosaic_CFA_Bayer(img)
    got_cfa, got_cfa4 = D.mosaic_cfa_bayer(img)
    np.testing.assert_array_equal(got_cfa, want_cfa)
    np.testing.assert_array_equal(got_cfa4, want_cfa4)


def test_dm_matlab_matches_reference(rng):
    ref = oracle.reference_module("utils.utils_mosaic")
    cfa4 = rng.random((2, 16, 16, 4)).astype(np.float32)
    want = ref.dm_matlab(torch.from_numpy(cfa4.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(D.dm_matlab(jnp.asarray(cfa4))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blur_kernel_gaussian_formula():
    # NB the reference's fspecial_gaussian calls the removed `scipy.finfo` API
    # and crashes on modern scipy, so compare against the MATLAB formula
    # directly (utils_deblur.py:54-65); the flip is a no-op for a symmetric
    # gaussian.
    got = D.get_blur_kernel("gaussian")
    siz = (25 - 1) / 2.0
    x, y = np.meshgrid(np.arange(-siz, siz + 1), np.arange(-siz, siz + 1))
    h = np.exp(-(x * x + y * y) / (2 * 1.6**2))
    h[h < np.finfo(float).eps * h.max()] = 0
    h /= h.sum()
    np.testing.assert_allclose(got, h, atol=1e-7)


def test_levin_kernel_matches_reference():
    ref = oracle.reference_module("utils.utils_deblur")
    want = ref.get_blur_kernel("real3").numpy()  # (3,1,kh,kw), flipped
    got = D.get_blur_kernel("real3")
    np.testing.assert_allclose(got, want[0, 0], atol=1e-7)


def test_levin_kernels_load():
    for i in range(1, 9):
        k = D.get_blur_kernel(f"real{i}")
        assert k.ndim == 2 and np.isfinite(k).all()
        assert k.sum() == pytest.approx(1.0, abs=1e-4)


def test_apply_blur_matches_reference_conv(rng):
    """blur(gt)+noise synthesis must equal the reference's grouped conv2d
    (engines/base.py:131-142)."""
    import torch.nn.functional as F

    k = D.get_blur_kernel("gaussian")
    gt = rng.random((2, 40, 40, 3)).astype(np.float32)
    tk = torch.from_numpy(k.copy()).repeat(3, 1, 1, 1)
    bkh, bkw = k.shape[0] // 2, k.shape[1] // 2
    want = F.conv2d(torch.from_numpy(gt.transpose(0, 3, 1, 2)), tk,
                    groups=3, padding=(bkh, bkw)).numpy()
    got = np.asarray(D.apply_blur(jnp.asarray(gt), k)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_val_noise_matches_reference_rng():
    """sha256-filename-seeded val noise must reproduce the reference's draw
    (restoration_dn.py:135-141, CHW order)."""
    from hashlib import sha256

    shape_hwc = (8, 9, 3)
    fname = "0801_x4.png"
    img_name = fname.split("_")[0]
    seed = np.frombuffer(sha256(img_name.encode()).digest(), dtype="uint32")
    want = np.random.RandomState(seed).normal(0, 25 / 255.0, (3, 8, 9))
    got = D.val_noise(fname, shape_hwc, 25.0)
    np.testing.assert_allclose(got, want.transpose(1, 2, 0), atol=1e-7)


def test_jpeg_compress_roundtrip(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    lq = D.jpeg_compress(img, 40)
    assert lq.shape == img.shape and lq.dtype == np.uint8
    # quality 95 should be closer to the original than quality 10
    err95 = np.abs(D.jpeg_compress(img, 95).astype(int) - img.astype(int)).mean()
    err10 = np.abs(D.jpeg_compress(img, 10).astype(int) - img.astype(int)).mean()
    assert err95 < err10


def test_db_forward_train_crop():
    k = D.get_blur_kernel("gaussian")
    gt = jnp.ones((1, 40, 40, 3))
    noise = jnp.zeros((1, 40, 40, 3))
    lq, tgt = D.db_forward(noise, gt, k, training=True)
    assert lq.shape == (1, 16, 16, 3)  # 40 - 2*12
    assert tgt.shape == (1, 16, 16, 3)
    lq_v, tgt_v = D.db_forward(noise, gt, k, training=False)
    assert lq_v.shape == (1, 40, 40, 3)


def test_conv2_mirror_matches_ndimage():
    """_conv2_mirror (cv2.filter2D fast path) == scipy.ndimage with
    mode='mirror', for both convolve (flip=True, HWC) and correlate
    (flip=False, HW) on the kernel population degradation_sr2 uses."""
    import numpy as np
    from scipy import ndimage

    from grlir.data import bsr_utils as bu

    rng = np.random.default_rng(0)
    img = rng.random((64, 80, 3)).astype(np.float32)
    for ks in (7, 21, 25):
        k = bu._fspecial_gaussian(ks, 2.5)
        want = ndimage.convolve(img, k[..., None], mode="mirror")
        np.testing.assert_allclose(bu._conv2_mirror(img, k), want, atol=1e-6)
        ka = bu.anisotropic_gaussian(ksize=ks, theta=0.7, l1=3.0, l2=1.0)
        want = ndimage.convolve(img, ka[..., None], mode="mirror")
        np.testing.assert_allclose(bu._conv2_mirror(img, ka), want, atol=1e-6)
    cfa = rng.random((32, 32)).astype(np.float32)
    for k in bu._malvar_kernels():
        want = ndimage.correlate(cfa, k, mode="mirror")
        np.testing.assert_allclose(
            bu._conv2_mirror(cfa, k, flip=False), want, atol=1e-6)

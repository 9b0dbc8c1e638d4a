"""Camera ISP chain parity vs the live reference utils_isp."""

import numpy as np
import pytest
import torch

import oracle
from grlir.data import bsr_utils as B


@pytest.fixture(scope="module")
def ref_isp():
    return oracle.reference_module("utils.utils_bsr.utils_isp")


def _models(ref_isp, seed=0):
    import scipy.io as spio
    import os.path as osp

    rng = np.random.default_rng(seed)
    prof = spio.loadmat(osp.join(B.CAMERA_PROFILE_DIR, "nikon_d810.mat"),
                        squeeze_me=True)
    tones = spio.loadmat(osp.join(B.CAMERA_PROFILE_DIR, "tonecurves.mat"),
                         squeeze_me=True)["ToneCurves"]
    tone = np.reshape(tones[1], (2, -1), "F")
    fm1 = np.asarray(prof["ForwardMatrix1"], np.float64).reshape(3, 3)
    cam2xyz = fm1 @ np.diag([1.5, 1.0, 1.8])
    offset = 0.05

    mine = B.ISPNet(cam2xyz, tone[0], tone[1], offset)
    theirs = ref_isp.ISPNet(
        weight_raw2xyz=torch.from_numpy(cam2xyz).float(),
        ToneCurveX=tone[0], ToneCurveY=tone[1],
        BaselineExposure=0, BaselineExposureOffset=offset,
    )
    return mine, theirs, rng


def test_forward_chain_matches(ref_isp):
    mine, theirs, rng = _models(ref_isp)
    img = rng.random((32, 32, 3)).astype(np.float32)
    want = (
        theirs.forward(
            torch.from_numpy(img.transpose(2, 0, 1))[None].clone(),
            for_noisy=False)
        .numpy()[0].transpose(1, 2, 0)
    )
    got = mine.forward(img.copy(), for_noisy=False)
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_reverse_chain_matches(ref_isp):
    mine, theirs, rng = _models(ref_isp, seed=1)
    img = rng.random((32, 32, 3)).astype(np.float32)
    want = (
        theirs.reverse(
            torch.from_numpy(img.transpose(2, 0, 1))[None].clone(),
            for_noisy=False)
        .numpy()[0].transpose(1, 2, 0)
    )
    got = mine.reverse(img.copy(), for_noisy=False)
    np.testing.assert_allclose(got, want, atol=3e-3)


def test_demosaic_mosaic_matches(ref_isp):
    rng = np.random.default_rng(2)
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    dm = ref_isp.Demosaic(NeedDemosaic=True)
    # mosaic (reverse) parity
    want_cfa = dm.reverse(
        torch.from_numpy(rgb.transpose(2, 0, 1))[None].clone()).numpy()[0, 0]
    got_cfa = B.mosaic_rggb(rgb)
    np.testing.assert_allclose(got_cfa, want_cfa, atol=1e-6)
    # demosaic (forward) parity
    want_rgb = dm.forward(
        torch.from_numpy(got_cfa[None, None]).clone()
    ).numpy()[0].transpose(1, 2, 0)
    got_rgb = B.demosaic_malvar(got_cfa)
    np.testing.assert_allclose(got_rgb, want_rgb, atol=1e-5)


def test_gamma_matches_reference_colors(ref_isp):
    color = oracle.reference_module("utils.utils_bsr.utils_color")
    x = np.linspace(0, 1, 101, dtype=np.float32)
    want = color.linear2gamma(torch.from_numpy(x.copy()), 0, True).numpy()
    got = B.linear2gamma_srgb(x, True)
    np.testing.assert_allclose(got, want, atol=1e-6)
    want_r = color.linear2gamma(torch.from_numpy(x.copy()), 0, False).numpy()
    got_r = B.linear2gamma_srgb(x, False)
    np.testing.assert_allclose(got_r, want_r, atol=1e-6)


def test_xyz2rgb_weight_matches(ref_isp):
    color = oracle.reference_module("utils.utils_bsr.utils_color")
    want = color.xyz2linearrgb_weight(0, True).numpy()
    got = B.xyz2linearrgb_weight()
    np.testing.assert_allclose(got, want, atol=1e-6)

"""Metric parity tests against the live reference implementations."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

import oracle
from grlir.metrics import basic as M
from grlir.metrics.collect import MetricAccumulator, dedup_average
from grlir.utils.image import rgb2ycbcr, tensor_round


def _rand_pair(rng, h=64, w=64, c=3, b=2):
    a = rng.random((b, h, w, c)).astype(np.float32)
    noise = rng.normal(0, 0.05, a.shape).astype(np.float32)
    return a, np.clip(a + noise, 0, 1).astype(np.float32)


def test_psnr_matches_reference(rng):
    ref = oracle.reference_module("utils.metrics.psnr")
    gt, pred = _rand_pair(rng)
    want = ref.psnr(torch.from_numpy(pred.transpose(0, 3, 1, 2)),
                    torch.from_numpy(gt.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(M.psnr(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_psnr_y_matches_reference(rng):
    ref_img = oracle.reference_module("utils.utils_image")
    ref = oracle.reference_module("utils.metrics.psnr")
    gt, pred = _rand_pair(rng)
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    want = ref.psnr(ref_img.rgb2ycbcr(tp, 1.0), ref_img.rgb2ycbcr(tg, 1.0)).numpy()
    got = np.asarray(M.psnr_y(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_ssim_matches_reference(rng):
    ref = oracle.reference_module("utils.metrics.ssim")
    gt, pred = _rand_pair(rng)
    want = ref.ssim(torch.from_numpy(pred.transpose(0, 3, 1, 2)),
                    torch.from_numpy(gt.transpose(0, 3, 1, 2)),
                    size_average=False).numpy()
    got = np.asarray(M.ssim(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_psnrb_matches_reference(rng):
    ref = oracle.reference_module("utils.metrics.psnrb")
    gt, pred = _rand_pair(rng, h=72, w=96)
    # NB reference psnrb(target, input): BEF computed on `input` == restored
    want = ref.psnrb(torch.from_numpy(gt.transpose(0, 3, 1, 2)),
                     torch.from_numpy(pred.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(M.psnrb(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rgb2ycbcr_matches_reference(rng):
    ref_img = oracle.reference_module("utils.utils_image")
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    want = ref_img.rgb2ycbcr(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 1.0, only_y=False
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(rgb2ycbcr(jnp.asarray(x), 1.0, only_y=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tensor_round_matches_reference(rng):
    ref_img = oracle.reference_module("utils.utils_image")
    x = (rng.random((1, 8, 8, 3)) * 1.4 - 0.2).astype(np.float32)
    want = ref_img.tensor_round(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(tensor_round(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_niqe_matches_reference(rng):
    ref = oracle.reference_module("utils.metrics.niqe")
    from grlir.metrics.niqe import calculate_niqe

    # textured image: NIQE's AGGD fits need both-signed MSCN coefficients in
    # every block, so use structured content + strong noise (>= 96x96 blocks)
    yy, xx = np.mgrid[0:224, 0:224] / 224.0
    base = np.sin(8 * yy) * 0.3 + xx * 0.3 + 0.2
    y = (base + 0.3 * rng.random((224, 224))).clip(0, 1).astype(np.float32)
    y255 = y * 255.0
    want = ref.calculate_niqe(y255, crop_border=0, input_order="HW")
    got = calculate_niqe(y255[..., None], crop_border=0, data_range=255.0)
    assert got == pytest.approx(want, rel=1e-5)


def test_dedup_average():
    vals = np.array([10.0, 20.0, 30.0, 20.0])
    idx = np.array([0, 1, 2, 1])  # duplicate sample 1 (DDP padding)
    assert dedup_average(vals, idx) == pytest.approx(20.0)


def test_metric_accumulator():
    acc = MetricAccumulator(["psnr"])
    acc.update({"psnr": np.array([30.0, 32.0])}, np.array([0, 1]), ["a", "b"])
    acc.update({"psnr": np.array([34.0, 32.0])}, np.array([2, 1]), ["c", "b"])
    out = acc.compute()
    assert out["psnr"] == pytest.approx(32.0)
    table = acc.per_image_table()
    assert "Filename" in table and "a" in table

"""Golden tests: grlir.models.commons vs the live reference EDSR commons
(/root/reference/models/common/resblock.py, common_edsr.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle

oracle._install_stubs()
import torch  # noqa: E402

from grlir.models import commons  # noqa: E402


def _t2j(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _conv_params(m):
    p = {"kernel": _t2j(m.weight)}
    if m.bias is not None:
        p["bias"] = jnp.asarray(m.bias.detach().numpy())
    return p


@pytest.fixture(scope="module")
def ref():
    import importlib
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        rb = importlib.import_module("models.common.resblock")
        ce = importlib.import_module("models.common.common_edsr")
    finally:
        sys.path.remove("/root/reference")
    return rb, ce


def test_mean_shift(ref):
    _, ce = ref
    torch.manual_seed(0)
    x = torch.rand(2, 3, 16, 16)
    for sign in (-1, 1):
        tm = ce.MeanShift(255.0, sign=sign).eval()
        want = tm(x).detach().numpy().transpose(0, 2, 3, 1)
        got = np.asarray(commons.mean_shift(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 255.0, sign=sign))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_resblock_plain(ref):
    rb, _ = ref
    torch.manual_seed(1)
    tm = rb.ResBlock(num_feats=16, res_scale=0.5).eval()
    x = torch.randn(2, 16, 12, 12)
    want = tm(x).detach().numpy().transpose(0, 2, 3, 1)
    params = {"params": {"conv1": _conv_params(tm.conv1),
                         "conv2": _conv_params(tm.conv2)}}
    got = np.asarray(commons.ResBlock(16, res_scale=0.5).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_resblock_wrapper(ref):
    rb, _ = ref
    torch.manual_seed(2)
    tm = rb.ResBlockWrapper(num_feats=8).eval()
    x = torch.randn(2, 10 * 6, 8)  # (B, L, C)
    want = tm(x, (10, 6)).detach().numpy()
    params = {"params": {"conv1": _conv_params(tm.conv1),
                         "conv2": _conv_params(tm.conv2)}}
    got = np.asarray(commons.ResBlockWrapper(8).apply(
        params, jnp.asarray(x.numpy()), (10, 6)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_edsr_resblock_esa(ref):
    _, ce = ref
    torch.manual_seed(3)
    tm2 = ce.ResBlock(ce.default_conv, 24, 3, res_scale=0.8,
                      esa_block=True).eval()
    x = torch.randn(1, 24, 33, 31)
    want = tm2(x).detach().numpy().transpose(0, 2, 3, 1)
    esa = tm2.esa
    params = {"params": {
        "body_conv0": _conv_params(tm2.body[0]),
        "body_conv1": _conv_params(tm2.body[2]),
        "c5": _conv_params(tm2.c5),
        "esa": {"conv1": _conv_params(esa.conv1),
                "conv2": _conv_params(esa.conv2),
                "conv3": _conv_params(esa.conv3),
                "conv4": _conv_params(esa.conv4),
                "conv_f": _conv_params(esa.conv_f)},
    }}
    got = np.asarray(commons.EDSRResBlock(24, res_scale=0.8).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_upsampler(ref, scale):
    _, ce = ref
    torch.manual_seed(4)
    tm = ce.Upsampler(ce.default_conv, scale, 8).eval()
    x = torch.randn(1, 8, 7, 9)
    want = tm(x).detach().numpy().transpose(0, 2, 3, 1)
    convs = [m for m in tm if isinstance(m, torch.nn.Conv2d)]
    params = {"params": {f"conv{i}": _conv_params(c)
                         for i, c in enumerate(convs)}}
    got = np.asarray(commons.Upsampler(scale, 8).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_lite_upsampler(ref):
    _, ce = ref
    torch.manual_seed(5)
    tm = ce.LiteUpsampler(ce.default_conv, 4, 8, n_out=3).eval()
    x = torch.randn(1, 8, 6, 5)
    want = tm(x).detach().numpy().transpose(0, 2, 3, 1)
    params = {"params": {"conv0": _conv_params(tm[0])}}
    got = np.asarray(commons.LiteUpsampler(4, 8, n_out=3).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_basic_block(ref):
    _, ce = ref
    torch.manual_seed(6)
    tm = ce.BasicBlock(ce.default_conv, 8, 16, 3, bias=False, bn=True).eval()
    x = torch.randn(2, 8, 9, 9)
    want = tm(x).detach().numpy().transpose(0, 2, 3, 1)
    bn = tm[1]
    params = {
        "params": {"conv": {"kernel": _t2j(tm[0].weight)},
                   "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                          "bias": jnp.asarray(bn.bias.detach().numpy())}},
        "batch_stats": {"bn": {
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy())}},
    }
    got = np.asarray(commons.BasicBlock(16, 3, bn=True).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

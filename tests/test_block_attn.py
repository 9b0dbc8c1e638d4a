"""Pallas v3 whole-block-half kernels vs the XLA cm path (interpret mode).

The v3 kernels (ops/pallas/block_attn.py) subsume qkv projection, window
partition, attention, and reverse in one pallas_call; these tests pin them
to the channel-major XLA formulation they replace (the same math as
/root/reference/models/common/mixed_attn_block_efficient.py:128-270).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.ops.layout import window_partition_cm, window_reverse_cm
from grlir.ops.pallas.block_attn import fused_stripe_half, fused_window_half

B, H, W, C = 2, 32, 32, 64
CW, HEADS = 32, 2
WH = WW = 8
N = WH * WW


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {
        "x": rng.standard_normal((B, H, W, C)).astype(np.float32),
        "wqkv": (rng.standard_normal((C, 3 * CW)) * 0.05).astype(np.float32),
        "bqkv": (rng.standard_normal(3 * CW) * 0.05).astype(np.float32),
        "rng": rng,
    }


def _norm(t):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-2, keepdims=True), 1e-12)


def _ref_window(d, logit_scale, bias, bands=None):
    xw = window_partition_cm(jnp.asarray(d["x"]), (WH, WW))
    qkv = (jnp.einsum("ck,bwcn->bwkn", jnp.asarray(d["wqkv"]), xw)
           + d["bqkv"][None, None, :, None])
    Bq, nW, _, N_ = qkv.shape
    q, k, v = (qkv[:, :, i * CW:(i + 1) * CW].reshape(Bq, nW, HEADS,
                                                      CW // HEADS, N_)
               for i in range(3))
    attn = jnp.einsum("bwhdn,bwhdm->bwhnm", _norm(q), _norm(k))
    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
    attn = attn * scale[None, None] + bias[None, None]
    if bands is not None:
        m = jnp.where(bands[:, None, :] != bands[:, :, None], -100.0, 0.0)
        attn = attn + m[None, :, None]
    attn = jax.nn.softmax(attn, axis=-1)
    y = jnp.einsum("bwhnm,bwhdm->bwhdn", attn, v).reshape(Bq, nW, CW, N_)
    return np.asarray(window_reverse_cm(y, (WH, WW), (H, W)))


@pytest.mark.parametrize("shifted", [False, True])
def test_window_half_matches_xla(data, shifted):
    rng = np.random.default_rng(1)
    logit_scale = jnp.full((HEADS, 1, 1), math.log(10.0), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.1, jnp.float32)
    bands = None
    if shifted:
        nW = (H // WH) * (W // WW)
        bands = jnp.asarray(rng.integers(0, 3, (nW, N)), jnp.int32)
    want = _ref_window(data, logit_scale, bias, bands)
    got = np.asarray(fused_window_half(
        jnp.asarray(data["x"]), jnp.asarray(data["wqkv"]),
        jnp.asarray(data["bqkv"]), logit_scale, bias, (WH, WW),
        bands=bands, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_window_half_in_kernel_shift(data):
    """shift= moves the cyclic roll INTO the kernel (stitched half-window
    row reads + column rotate): must equal pre-rolling x outside."""
    rng = np.random.default_rng(4)
    s = WH // 2
    logit_scale = jnp.full((HEADS, 1, 1), math.log(10.0), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.1, jnp.float32)
    nW = (H // WH) * (W // WW)
    bands = jnp.asarray(rng.integers(0, 3, (nW, N)), jnp.int32)
    x_rolled = {**data, "x": np.roll(data["x"], (-s, -s), axis=(1, 2))}
    want = _ref_window(x_rolled, logit_scale, bias, bands)
    got = np.asarray(fused_window_half(
        jnp.asarray(data["x"]), jnp.asarray(data["wqkv"]),
        jnp.asarray(data["bqkv"]), logit_scale, bias, (WH, WW),
        bands=bands, shift=s, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
    # gradients flow through the custom VJP's roll-aware recompute twin
    def loss(x):
        return jnp.sum(jnp.abs(fused_window_half(
            x, jnp.asarray(data["wqkv"]), jnp.asarray(data["bqkv"]),
            logit_scale, bias, (WH, WW), bands=bands, shift=s,
            interpret=True)))
    g = jax.grad(loss)(jnp.asarray(data["x"]))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("shifted", [False, True])
def test_window_half_large_window_matches_xla(shifted):
    """Large-window path (GRL-base w32): pack_w=1, bf16 resident bias,
    q-row-tiled attention.  N=1024 > _LARGE_N triggers it."""
    from grlir.ops.layout import window_partition_cm, window_reverse_cm

    rng = np.random.default_rng(2)
    Hb = Wb = 32
    whb = wwb = 32                       # one 32x32 window: N = 1024
    Nb, Cb, Cwb, hb = whb * wwb, 32, 16, 2
    x = rng.standard_normal((1, Hb, Wb, Cb)).astype(np.float32)
    wqkv = (rng.standard_normal((Cb, 3 * Cwb)) * 0.05).astype(np.float32)
    bqkv = (rng.standard_normal(3 * Cwb) * 0.05).astype(np.float32)
    logit_scale = jnp.full((hb, 1, 1), math.log(10.0), jnp.float32)
    # the large path stores the bias bf16 (the XLA cm path's bias output is
    # bf16 too — round-2 adopted numerics); pre-round the reference's copy
    bias = jnp.asarray(rng.standard_normal((hb, Nb, Nb)) * 0.1,
                       jnp.bfloat16).astype(jnp.float32)
    bands = None
    if shifted:
        bands = jnp.asarray(rng.integers(0, 3, (1, Nb)), jnp.int32)

    xw = window_partition_cm(jnp.asarray(x), (whb, wwb))
    qkv = (jnp.einsum("ck,bwcn->bwkn", jnp.asarray(wqkv), xw)
           + bqkv[None, None, :, None])
    Bq, nW, _, N_ = qkv.shape
    q, k, v = (qkv[:, :, i * Cwb:(i + 1) * Cwb].reshape(
        Bq, nW, hb, Cwb // hb, N_) for i in range(3))
    attn = jnp.einsum("bwhdn,bwhdm->bwhnm", _norm(q), _norm(k))
    attn = attn * jnp.exp(logit_scale)[None, None] + bias[None, None]
    if bands is not None:
        m = jnp.where(bands[:, None, :] != bands[:, :, None], -100.0, 0.0)
        attn = attn + m[None, :, None]
    attn = jax.nn.softmax(attn, axis=-1)
    y = jnp.einsum("bwhnm,bwhdm->bwhdn", attn, v).reshape(Bq, nW, Cwb, N_)
    want = np.asarray(window_reverse_cm(y, (whb, wwb), (Hb, Wb)))

    got = np.asarray(fused_window_half(
        jnp.asarray(x), jnp.asarray(wqkv), jnp.asarray(bqkv), logit_scale,
        bias, (whb, wwb), bands=bands, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def _ref_stripe(d, anchor, stripe, df, ls1, ls2, b1, b2,
                bands=None, bands_a=None):
    sh, sw = stripe
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    xw = window_partition_cm(jnp.asarray(d["x"]), (sh, sw))
    qkv = (jnp.einsum("ck,bwcn->bwkn", jnp.asarray(d["wqkv"]), xw)
           + d["bqkv"][None, None, :, None])
    a_cm = window_partition_cm(jnp.asarray(anchor), (ah, aw))
    Bq, nW, _, _ = qkv.shape
    q, k, v = (qkv[:, :, i * CW:(i + 1) * CW].reshape(Bq, nW, HEADS,
                                                      CW // HEADS, N1)
               for i in range(3))
    a = a_cm.reshape(Bq, nW, HEADS, CW // HEADS, N2)
    s1 = jnp.exp(jnp.minimum(ls1, math.log(100.0)))
    s2 = jnp.exp(jnp.minimum(ls2, math.log(100.0)))
    at1 = (jnp.einsum("bwhdn,bwhdm->bwhnm", _norm(a), _norm(k))
           * s1[None, None] + b1[None, None])
    if bands is not None:
        at1 = at1 + jnp.where(
            bands_a[:, None, :, None] != bands[:, None, None, :], -100.0, 0.0)
    at1 = jax.nn.softmax(at1, axis=-1)
    x1 = jnp.einsum("bwhnm,bwhdm->bwhdn", at1, v)
    at2 = (jnp.einsum("bwhdn,bwhdm->bwhnm", _norm(q), _norm(a))
           * s2[None, None] + b2[None, None])
    if bands is not None:
        at2 = at2 + jnp.where(
            bands[:, None, :, None] != bands_a[:, None, None, :], -100.0, 0.0)
    at2 = jax.nn.softmax(at2, axis=-1)
    y = jnp.einsum("bwhnm,bwhdm->bwhdn", at2, x1).reshape(Bq, nW, CW, N1)
    return np.asarray(window_reverse_cm(y, (sh, sw), (H, W)))


# (8,16) is a horizontal stripe; (16,8) exercises the vertical layout where
# the anchor is pre-partitioned (aw < 8 violates Mosaic sublane blocks)
@pytest.mark.parametrize("stripe", [(8, 16), (16, 8)])
@pytest.mark.parametrize("shifted", [False, True])
def test_stripe_half_matches_xla(data, stripe, shifted):
    rng = np.random.default_rng(2)
    sh, sw = stripe
    df = 4
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    anchor = rng.standard_normal((B, H // df, W // df, CW)).astype(np.float32)
    ls1 = jnp.full((HEADS, 1, 1), math.log(8.0), jnp.float32)
    ls2 = jnp.full((HEADS, 1, 1), math.log(12.0), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((HEADS, N2, N1)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((HEADS, N1, N2)) * 0.1, jnp.float32)
    bands = bands_a = None
    if shifted:
        nW = (H // sh) * (W // sw)
        bands = jnp.asarray(rng.integers(0, 3, (nW, N1)), jnp.int32)
        bands_a = jnp.asarray(rng.integers(0, 3, (nW, N2)), jnp.int32)
    want = _ref_stripe(data, anchor, stripe, df, ls1, ls2, b1, b2,
                       bands, bands_a)
    got = np.asarray(fused_stripe_half(
        jnp.asarray(data["x"]), jnp.asarray(anchor),
        jnp.asarray(data["wqkv"]), jnp.asarray(data["bqkv"]),
        ls1, ls2, b1, b2, stripe, df, bands=bands, bands_a=bands_a,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_stripe_half_in_kernel_shift(data):
    """shift= moves the x roll INTO the stripe kernel (horizontal resident
    path): must equal pre-rolling x outside.  The anchor stays pre-rolled
    by the caller (as in blocks.py)."""
    rng = np.random.default_rng(6)
    stripe, df = (8, 16), 4
    sh, sw = stripe
    ssh, ssw = sh // 2, sw // 2
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    anchor = rng.standard_normal((B, H // df, W // df, CW)).astype(np.float32)
    ls1 = jnp.full((HEADS, 1, 1), math.log(8.0), jnp.float32)
    ls2 = jnp.full((HEADS, 1, 1), math.log(12.0), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((HEADS, N2, N1)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((HEADS, N1, N2)) * 0.1, jnp.float32)
    nW = (H // sh) * (W // sw)
    bands = jnp.asarray(rng.integers(0, 3, (nW, N1)), jnp.int32)
    bands_a = jnp.asarray(rng.integers(0, 3, (nW, N2)), jnp.int32)
    # reference: x pre-rolled outside (anchor pre-rolled in both cases)
    x_rolled = {**data, "x": np.roll(data["x"], (-ssh, -ssw), axis=(1, 2))}
    want = _ref_stripe(x_rolled, anchor, stripe, df, ls1, ls2, b1, b2,
                       bands, bands_a)
    got = np.asarray(fused_stripe_half(
        jnp.asarray(data["x"]), jnp.asarray(anchor),
        jnp.asarray(data["wqkv"]), jnp.asarray(data["bqkv"]),
        ls1, ls2, b1, b2, stripe, df, bands=bands, bands_a=bands_a,
        shift=(ssh, ssw), interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # gradients flow through the roll-aware recompute twin
    def loss(x):
        return jnp.sum(jnp.abs(fused_stripe_half(
            x, jnp.asarray(anchor), jnp.asarray(data["wqkv"]),
            jnp.asarray(data["bqkv"]), ls1, ls2, b1, b2, stripe, df,
            bands=bands, bands_a=bands_a, shift=(ssh, ssw),
            interpret=True)))
    g = jax.grad(loss)(jnp.asarray(data["x"]))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0

    # vertical stripes fall back to the internal roll — same answer
    stripe_v, shift_v = (16, 8), (8, 4)
    b1v = jnp.asarray(rng.standard_normal((HEADS, N2, N1)) * 0.1, jnp.float32)
    b2v = jnp.asarray(rng.standard_normal((HEADS, N1, N2)) * 0.1, jnp.float32)
    xv_rolled = {**data, "x": np.roll(data["x"], (-8, -4), axis=(1, 2))}
    want_v = _ref_stripe(xv_rolled, anchor, stripe_v, df, ls1, ls2, b1v, b2v)
    got_v = np.asarray(fused_stripe_half(
        jnp.asarray(data["x"]), jnp.asarray(anchor),
        jnp.asarray(data["wqkv"]), jnp.asarray(data["bqkv"]),
        ls1, ls2, b1v, b2v, stripe_v, df, shift=shift_v, interpret=True))
    np.testing.assert_allclose(got_v, want_v, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("shifted", [False, True])
def test_stripe_half_large_matches_xla(data, shifted, monkeypatch):
    """Streamed-bias large-stripe path (GRL-base w32/df2 tiles): force the
    resident budget down so a (16,16)/df2 stripe routes through the two
    tiled kernels (nT2=2 anchor tiles, nT1=2 row bands, P=2 packed
    stripes), and pin it to the XLA reference."""
    from grlir.ops.pallas import block_attn as ba

    monkeypatch.setattr(ba, "_BIAS_VMEM_BUDGET", 100_000)
    monkeypatch.setattr(ba, "_STRIPE_ATTN_BUDGET", 64 * 1024)
    rng = np.random.default_rng(5)
    stripe, df = (16, 16), 2
    sh, sw = stripe
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    assert not ba._stripe_resident_supported(stripe, df, HEADS)
    assert ba._stripe_large_tiles(stripe, df, HEADS) == (32, 128)
    anchor = rng.standard_normal((B, H // df, W // df, CW)).astype(np.float32)
    ls1 = jnp.full((HEADS, 1, 1), math.log(8.0), jnp.float32)
    ls2 = jnp.full((HEADS, 1, 1), math.log(12.0), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((HEADS, N2, N1)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((HEADS, N1, N2)) * 0.1, jnp.float32)
    bands = bands_a = None
    if shifted:
        nW = (H // sh) * (W // sw)
        bands = jnp.asarray(rng.integers(0, 3, (nW, N1)), jnp.int32)
        bands_a = jnp.asarray(rng.integers(0, 3, (nW, N2)), jnp.int32)
    want = _ref_stripe(data, anchor, stripe, df, ls1, ls2, b1, b2,
                       bands, bands_a)
    got = np.asarray(fused_stripe_half(
        jnp.asarray(data["x"]), jnp.asarray(anchor),
        jnp.asarray(data["wqkv"]), jnp.asarray(data["bqkv"]),
        ls1, ls2, b1, b2, stripe, df, bands=bands, bands_a=bands_a,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_vmem_guards():
    from grlir.ops.pallas import block_attn as ba

    # GRL-S serving geometry fits
    assert ba.window_half_supported((256, 256), (8, 8), 3)
    assert ba.stripe_half_supported((256, 256), (8, 64), 4, 3)
    # GRL-base window-32 tiles don't (packed bias alone is >24 MB fp32)
    assert not ba.window_half_supported((256, 256), (32, 32), 6)
    # non-divisible geometry
    assert not ba.window_half_supported((250, 250), (8, 8), 3)


def test_model_level_v3_fallback(monkeypatch):
    """With the VMEM budget forced to 0 every v3 block must fall through to
    the XLA cm path and still match."""
    from dataclasses import replace

    from grlir.models.grl import GRL, GRLConfig
    from grlir.ops.pallas import block_attn as ba

    monkeypatch.setattr(ba, "_BIAS_VMEM_BUDGET", 0)
    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(
        GRL(replace(cfg, use_pallas_attention="v3")).apply(params, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_qkv_cm_split_mode_parity():
    """set_qkv_cm_mode('split') (three per-tensor contractions) must match
    the fused 3C projection bit-for-bit at the model level."""
    from dataclasses import replace

    from grlir.models import blocks
    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
        attn_io="cm",
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    blocks.set_qkv_cm_mode("split")
    try:
        got = np.asarray(model.apply(params, x))
    finally:
        blocks.set_qkv_cm_mode("fused")
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)


def test_bias_pair_flat_parity():
    """set_bias_pair_flat(True) (pair-flattened contraction + one transpose)
    must match the direct 5D factored-bias einsum at the model level."""
    from grlir.models import blocks
    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    blocks.set_bias_pair_flat(True)
    try:
        got = np.asarray(model.apply(params, x))
    finally:
        blocks.set_bias_pair_flat(False)
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)


def test_model_level_v3_parity():
    """Whole GRL forward with use_pallas_attention='v3' vs the XLA path."""
    from dataclasses import replace

    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)),
                    jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(
        GRL(replace(cfg, use_pallas_attention="v3")).apply(params, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_model_level_v3_grad_parity():
    """jax.grad through a v3-engaged model (custom VJP: kernel forward,
    pure-XLA recompute backward) matches the XLA path's gradients.  Without
    the custom VJP, differentiating through pallas_call crashes — the TPU
    default is v3, so GAN generator training and cm-io training depend on
    this (round-4 bench_notes caught the crash on hardware)."""
    from dataclasses import replace

    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    model = GRL(cfg)
    model_v3 = GRL(replace(cfg, use_pallas_attention="v3"))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(m, p):
        return jnp.mean(jnp.abs(m.apply(p, x) - gt))

    g_xla = jax.grad(lambda p: loss(model, p))(params)
    g_v3 = jax.grad(lambda p: loss(model_v3, p))(params)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_v, _ = jax.tree_util.tree_flatten(g_v3)
    assert len(flat_x) == len(flat_v)
    checked = 0
    for a, b in zip(flat_x, flat_v):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=2e-3)
        checked += 1
    assert checked > 50, checked

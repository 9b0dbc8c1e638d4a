"""Fused Pallas attention vs the XLA reference path (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.ops.pallas.attention import fused_cosine_attention


def _xla_reference(q, k, v, logit_scale, bias, mask):
    def norm(x):
        n = jnp.sqrt(jnp.sum(x * x, -1, keepdims=True))
        return x / jnp.maximum(n, 1e-12)

    attn = jnp.einsum("...nd,...md->...nm", norm(q), norm(k))
    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
    attn = attn * scale + bias[None, None]
    if mask is not None:
        attn = attn + mask[None, :, None, :, :]
    attn = jax.nn.softmax(attn, -1)
    return jnp.einsum("...nm,...md->...nd", attn, v)


@pytest.mark.parametrize("shape", [
    # (B, nW, h, N1, N2, d): square windows and skinny stripe patterns
    (1, 16, 2, 64, 64, 32),
    (2, 8, 2, 64, 64, 32),
    (1, 8, 2, 32, 512, 32),   # anchor->window (a2w)
    (1, 8, 2, 512, 32, 32),   # window->anchor (w2a)
])
@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_matches_xla(shape, with_mask):
    B, nW, h, N1, N2, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, nW, h, N1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nW, h, N2, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nW, h, N2, d)), jnp.float32)
    logit_scale = jnp.asarray(
        rng.uniform(0, 3, (h, 1, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)
    mask = None
    if with_mask:
        mask = jnp.where(
            jnp.asarray(rng.random((nW, N1, N2))) > 0.8, -100.0, 0.0
        ).astype(jnp.float32)

    want = np.asarray(_xla_reference(q, k, v, logit_scale, bias, mask))
    got = np.asarray(fused_cosine_attention(
        q, k, v, logit_scale, bias, mask, block_windows=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_logit_scale_clamped():
    """logit_scale above log(100) must clamp like the reference."""
    B, nW, h, N, d = 1, 4, 1, 16, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, nW, h, N, d)), jnp.float32)
    big = jnp.full((h, 1, 1), 10.0)  # exp(10) >> 100
    clamped = jnp.full((h, 1, 1), math.log(100.0))
    bias = jnp.zeros((h, N, N), jnp.float32)
    a = np.asarray(fused_cosine_attention(q, q, q, big, bias, None,
                                          interpret=True))
    b = np.asarray(fused_cosine_attention(q, q, q, clamped, bias, None,
                                          interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_model_level_pallas_parity():
    """Whole GRL forward: use_pallas_attention must match the XLA path."""
    from dataclasses import replace

    from grlir.models.grl import GRL, GRLConfig

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(GRL(replace(cfg, use_pallas_attention=True)).apply(params, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [
    (1, 16, 2, 64, 64, 32),
    (2, 8, 2, 64, 64, 32),
])
@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("pack", [2, 4])
def test_packed_matches_xla(shape, with_mask, pack):
    from grlir.ops.pallas.attention import fused_cosine_attention_packed

    B, nW, h, N1, N2, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, nW, h, N1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nW, h, N2, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nW, h, N2, d)), jnp.float32)
    logit_scale = jnp.asarray(rng.uniform(0, 3, (h, 1, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)
    mask = None
    if with_mask:
        mask = jnp.where(jnp.asarray(rng.random((nW, N1, N2))) > 0.8,
                         -100.0, 0.0).astype(jnp.float32)

    want = np.asarray(_xla_reference(q, k, v, logit_scale, bias, mask))
    got = np.asarray(fused_cosine_attention_packed(
        q, k, v, logit_scale, bias, mask, pack=pack, groups_per_block=4,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("with_bands", [False, True])
@pytest.mark.parametrize("heads", [2, 4])
def test_qkv_kernel_matches_xla(with_bands, heads):
    """v2 kernel (partitioned qkv in, merged heads out) vs the XLA path."""
    from grlir.ops.pallas.attention import fused_window_attention_qkv

    B, nW, N, C = 2, 8, 64, 32
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, nW, N, 3 * C)), jnp.float32)
    logit_scale = jnp.asarray(rng.uniform(0, 3, (heads, 1, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, N, N)), jnp.float32)
    bands = None
    mask = None
    if with_bands:
        bands = jnp.asarray(rng.integers(0, 9, (nW, N)), jnp.int32)
        mask = jnp.where(bands[:, None, :] != bands[:, :, None], -100.0, 0.0)

    # reference: split [3, h, d], attend, merge
    d = C // heads
    x = qkv.reshape(B, nW, N, 3, heads, d)
    q, k, v = (jnp.moveaxis(x[..., i, :, :], -2, 2) for i in range(3))
    want = np.asarray(_xla_reference(q, k, v, logit_scale, bias, mask))
    want = np.asarray(want.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C))

    got = np.asarray(fused_window_attention_qkv(
        qkv, logit_scale, bias, heads, bands, block_windows=4,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

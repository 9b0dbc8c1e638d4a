"""Flash-tiled large-geometry attention vs the XLA path (interpret on CPU).

flash_rect_attention targets the GRL-base eval geometries (window 32 /
stripes 64x64: 1024-4096 tokens per window, scripts/grl/grl_test.md:46) where
whole-window kernels and the XLA lowering both materialize (nW, h, N1, N2)
attention matrices in HBM.  These tests check the kernel against the plain
einsum path and check the model-level routing (blocks.py picks the flash
route above _FLASH_MIN_TOKENS) by lowering the threshold so the small golden
geometries exercise the same code path.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.ops.pallas.flash_attention import flash_rect_attention


def _xla_reference_dmajor(q, k, v, logit_scale, bias, bands_q, bands_k):
    """q/k/v (B, nW, h, d, N); bias (h, N1, N2); bands (nW, N)."""
    def norm(x):
        n = jnp.sqrt(jnp.sum(x * x, -2, keepdims=True))
        return x / jnp.maximum(n, 1e-12)

    attn = jnp.einsum("...dn,...dm->...nm", norm(q), norm(k))
    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
    attn = attn * scale + bias[None, None]
    if bands_q is not None:
        mask = jnp.where(bands_q[:, :, None] != bands_k[:, None, :],
                         -100.0, 0.0)
        attn = attn + mask[None, :, None]
    attn = jax.nn.softmax(attn, -1)
    return jnp.einsum("...nm,...dm->...dn", attn, v)


@pytest.mark.parametrize("shape", [
    # (B, nW, h, d, N1, N2): big square windows and rectangular a2w/w2a
    (1, 4, 2, 32, 1024, 1024),   # window 32 (GRL-base eval)
    (1, 2, 2, 32, 256, 1024),    # anchor -> window
    (1, 2, 2, 32, 1024, 256),    # window -> anchor
    (2, 2, 3, 16, 384, 96),      # non-pow2 token counts (T1 picks a divisor)
])
@pytest.mark.parametrize("with_bands", [False, True])
def test_flash_matches_xla(shape, with_bands):
    B, nW, h, d, N1, N2 = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, nW, h, d, N1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nW, h, d, N2)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nW, h, d, N2)), jnp.float32)
    logit_scale = jnp.asarray(rng.uniform(0, 3, (h, 1, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)
    bands_q = bands_k = None
    if with_bands:
        bands_q = jnp.asarray(rng.integers(0, 9, (nW, N1)), jnp.int32)
        bands_k = jnp.asarray(rng.integers(0, 9, (nW, N2)), jnp.int32)

    want = np.asarray(_xla_reference_dmajor(
        q, k, v, logit_scale, bias, bands_q, bands_k))
    got = np.asarray(flash_rect_attention(
        q, k, v, logit_scale, bias, bands_q=bands_q, bands_k=bands_k,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_bf16_close():
    """bf16 inputs stay within bf16 tolerance of the fp32 reference."""
    B, nW, h, d, N1, N2 = 1, 2, 2, 16, 512, 512
    rng = np.random.default_rng(1)
    q32 = jnp.asarray(rng.standard_normal((B, nW, h, d, N1)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((B, nW, h, d, N2)), jnp.float32)
    v32 = jnp.asarray(rng.standard_normal((B, nW, h, d, N2)), jnp.float32)
    logit_scale = jnp.asarray(rng.uniform(0, 3, (h, 1, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)

    want = np.asarray(_xla_reference_dmajor(
        q32, k32, v32, logit_scale, bias, None, None))
    got = np.asarray(flash_rect_attention(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16), logit_scale, bias,
        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.06, rtol=0.05)


def test_flash_logit_scale_clamped():
    B, nW, h, d, N = 1, 1, 1, 8, 320
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, nW, h, d, N)), jnp.float32)
    bias = jnp.zeros((h, N, N), jnp.float32)
    big = jnp.full((h, 1, 1), 10.0)
    clamped = jnp.full((h, 1, 1), math.log(100.0))
    a = np.asarray(flash_rect_attention(q, q, q, big, bias, interpret=True))
    b = np.asarray(flash_rect_attention(q, q, q, clamped, bias,
                                        interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("mode", [True, "window", "stripe"])
def test_model_level_flash_routing(monkeypatch, mode):
    """Whole GRL forward through the flash route must match the XLA path.

    The golden geometries are small (N <= 64 tokens), so the production
    threshold would skip the flash kernel; lowering _FLASH_MIN_TOKENS makes
    every window/stripe attention take the flash route, covering the wiring
    in WindowAttention/AnchorStripeAttention._forward_cm (band plumbing,
    reshapes, shift handling).
    """
    from dataclasses import replace

    from grlir.models import blocks
    from grlir.models.grl import GRL, GRLConfig

    monkeypatch.setattr(blocks, "_FLASH_MIN_TOKENS", 0)

    cfg = GRLConfig(
        embed_dim=32, upscale=1, upsampler="", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        mlp_ratio=2, stripe_size=(8, None), stripe_groups=(None, 4),
        stripe_shift=True, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
    model = GRL(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(
        GRL(replace(cfg, use_pallas_attention=mode)).apply(params, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

"""Loss-function tests (charbonnier formula parity + GAN semantics)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from grlir.losses import charbonnier_loss, l1_loss, mse_loss, tv_loss, weighted_loss
from grlir.losses.gan import gan_loss


def test_charbonnier_matches_formula(rng):
    a = rng.random((2, 8, 8, 3)).astype(np.float32)
    b = rng.random((2, 8, 8, 3)).astype(np.float32)
    # reference CharbonnierLoss: mean(sqrt(diff^2 + eps^2)), eps=1e-3
    want = float(np.mean(np.sqrt((a - b) ** 2 + 1e-6)))
    got = float(charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(want, rel=1e-6)


def test_l1_mse_match_torch(rng):
    a = rng.random((2, 4, 4, 3)).astype(np.float32)
    b = rng.random((2, 4, 4, 3)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    assert float(l1_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(torch.nn.functional.l1_loss(ta, tb)), rel=1e-6)
    assert float(mse_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(torch.nn.functional.mse_loss(ta, tb)), rel=1e-6)


def test_vanilla_gan_matches_bce(rng):
    logits = rng.normal(0, 2, (4, 8, 8, 1)).astype(np.float32)
    tl = torch.from_numpy(logits)
    want_real = float(torch.nn.functional.binary_cross_entropy_with_logits(
        tl, torch.ones_like(tl)))
    got = float(gan_loss(jnp.asarray(logits), True, "vanilla", is_disc=True))
    assert got == pytest.approx(want_real, rel=1e-5)
    # generator side scales by loss_weight
    got_g = float(gan_loss(jnp.asarray(logits), True, "vanilla",
                           is_disc=False, loss_weight=0.1))
    assert got_g == pytest.approx(0.1 * want_real, rel=1e-5)


def test_weighted_loss_combinator(rng):
    a = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    total, parts = weighted_loss(
        {"l1": (2.0, l1_loss), "mse": (0.5, mse_loss)}, a, b)
    assert float(total) == pytest.approx(
        2.0 * float(parts["l1"]) + 0.5 * float(parts["mse"]), rel=1e-6)


def test_tv_loss_zero_for_constant():
    x = jnp.ones((1, 8, 8, 3))
    assert float(tv_loss(x)) == 0.0

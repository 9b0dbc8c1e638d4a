"""GAN losses (losses.py:190-293): vanilla / lsgan / wgan / wgan_softplus / hinge."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, target):
    # stable BCEWithLogits: max(x,0) - x*z + log(1+exp(-|x|))
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_loss(logits, target_is_real: bool, gan_type: str = "vanilla",
             is_disc: bool = False, real_label: float = 1.0,
             fake_label: float = 0.0, loss_weight: float = 1.0):
    """Single-side GAN loss on discriminator logits.

    Matches reference semantics: generator loss is scaled by loss_weight,
    discriminator loss never is (losses.py:284-293).
    """
    if gan_type == "vanilla":
        label = real_label if target_is_real else fake_label
        loss = _bce_with_logits(logits, jnp.full_like(logits, label))
    elif gan_type == "lsgan":
        label = real_label if target_is_real else fake_label
        loss = jnp.mean((logits - label) ** 2)
    elif gan_type == "wgan":
        loss = -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    elif gan_type == "wgan_softplus":
        loss = jnp.mean(jax.nn.softplus(-logits if target_is_real else logits))
    elif gan_type == "hinge":
        if is_disc:
            sign = -1.0 if target_is_real else 1.0
            loss = jnp.mean(jax.nn.relu(1.0 + sign * logits))
        else:
            loss = -jnp.mean(logits)
    else:
        raise ValueError(f"unknown gan_type {gan_type}")
    return loss if is_disc else loss * loss_weight

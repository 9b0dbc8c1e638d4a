"""Pixel losses (pure functions; /root/reference/losses/losses.py).

The engine combines them as a weighted sum over a config dict
(engines/base.py:184-204) — `weighted_loss` reproduces that combinator.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Tuple

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def charbonnier_loss(pred, target, eps: float = 1e-3):
    """sqrt(diff^2 + eps^2) mean (losses.py:42-56; eps 1e-3)."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def tv_loss(pred, weight: float = 1.0):
    """Total variation on NHWC batches (losses.py:22-39 semantics)."""
    h_tv = jnp.mean((pred[:, 1:, :, :] - pred[:, :-1, :, :]) ** 2)
    w_tv = jnp.mean((pred[:, :, 1:, :] - pred[:, :, :-1, :]) ** 2)
    return weight * 2.0 * (h_tv + w_tv)


LOSS_FNS: Dict[str, Callable] = {
    "l1": l1_loss,
    "mse": mse_loss,
    "l2": mse_loss,
    "charbonnier": charbonnier_loss,
    "tv": lambda pred, target: tv_loss(pred),
}


def weighted_loss(losses: Mapping[str, Tuple[float, Callable]], pred, target):
    """Weighted multi-loss: {name: (weight, fn)} -> (total, {name: value})."""
    values = {}
    total = 0.0
    for name, (weight, fn) in losses.items():
        v = fn(pred, target)
        values[name] = v
        total = total + weight * v
    return total, values

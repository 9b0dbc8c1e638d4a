"""Optimizers (optax) mirroring the reference's config groups.

The reference uses plain torch Adam/AdamW (config/optimizer/{adam,adamw}.yaml)
with per-step schedulers; here the schedule is an optax schedule function fed
through `optax.inject_hyperparams` so current LR is observable for logging.
"""

from __future__ import annotations

from typing import Callable, Optional

import optax

from grlir.optim.schedules import (
    SCHEDULES,
    cosine_annealing_restart_cyclic,
    gradual_warmup_cosine,
    multi_step_warmup,
    parse_milestones,
    step_lr,
    warmup_cosine,
)


def build_optimizer(
    name: str = "adamw",
    schedule: Optional[Callable] = None,
    learning_rate: float = 2e-4,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else learning_rate
    if name == "adam":
        make = lambda learning_rate: optax.adam(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "adamw":
        make = lambda learning_rate: optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay)
    elif name == "sgd":
        make = lambda learning_rate: optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {name}")
    return optax.inject_hyperparams(make)(learning_rate=lr)


def current_lr(opt_state) -> float:
    """Read the injected learning rate back out for logging."""
    return float(opt_state.hyperparams["learning_rate"])


__all__ = [
    "build_optimizer", "current_lr", "SCHEDULES", "parse_milestones",
    "multi_step_warmup", "cosine_annealing_restart_cyclic",
    "gradual_warmup_cosine", "warmup_cosine", "step_lr",
]

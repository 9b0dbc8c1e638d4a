"""LR schedules as optax-compatible pure functions of the step counter.

Reproduces the reference's scheduler set (/root/reference/optim/): multi-step with
linear warmup, Restormer cosine-annealing-with-restarts, gradual-warmup cosine,
timm-style warmup cosine, and plain step decay — all stepped per optimizer step
(engines/base.py:451-470).
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np


def parse_milestones(milestones: Union[str, Sequence[int]]) -> list:
    """'100000+150000+175000' -> [100000, 150000, 175000] (multi_steplr.py:33-35)."""
    if isinstance(milestones, str):
        return list(map(int, milestones.split("+")))
    return list(milestones)


def multi_step_warmup(base_lr: float, milestones, gamma: float = 0.1,
                      warmup_iter: int = -1, warmup_init_lr: float = 0.0):
    """MultiStepLRWarmup (multi_steplr.py:5-39): linear warmup then step decay."""
    ms = jnp.asarray(sorted(parse_milestones(milestones)))

    def schedule(step):
        step = jnp.asarray(step)
        decay = gamma ** jnp.sum(step >= ms)
        lr = base_lr * decay
        if warmup_iter > 0:
            warm = warmup_init_lr + (base_lr - warmup_init_lr) / warmup_iter * step
            lr = jnp.where(step < warmup_iter, warm, lr)
        return lr

    return schedule


def cosine_annealing_restart_cyclic(base_lr: float, periods: Sequence[int],
                                    restart_weights: Sequence[float] = (1,),
                                    eta_mins: Sequence[float] = (0,)):
    """Restormer CosineAnnealingRestartCyclicLR (optim/lr_scheduler.py:30-80)."""
    assert len(periods) == len(restart_weights) == len(eta_mins)
    cum = np.cumsum(np.asarray(periods))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # index of right-closest cumulative period (<= semantics)
        idx = jnp.sum(step > jnp.asarray(cum, jnp.float32))
        idx = jnp.clip(idx, 0, len(periods) - 1)
        nearest_restart = jnp.where(
            idx == 0, 0.0, jnp.asarray(np.concatenate([[0], cum]), jnp.float32)[idx]
        )
        period = jnp.asarray(np.asarray(periods, np.float32))[idx]
        weight = jnp.asarray(np.asarray(restart_weights, np.float32))[idx]
        eta_min = jnp.asarray(np.asarray(eta_mins, np.float32))[idx]
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * ((step - nearest_restart) / period))
        )

    return schedule


def gradual_warmup_cosine(base_lr: float, total_steps: int, warmup_steps: int,
                          eta_min: float = 1e-6, multiplier: float = 1.0):
    """GradualWarmupScheduler + CosineAnnealingLR (optim/warmup_scheduler/)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        target = base_lr * multiplier
        warm = base_lr * ((multiplier - 1.0) * step / warmup_steps + 1.0) \
            if multiplier > 1.0 else base_lr * step / warmup_steps
        t = jnp.clip(step - warmup_steps, 0, total_steps - warmup_steps)
        cos = eta_min + (target - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / (total_steps - warmup_steps))
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_cosine(base_lr: float, t_initial: int, lr_min: float = 1e-5,
                  warmup_lr_init: float = 1e-5, warmup_t: int = 0):
    """timm CosineLRScheduler subset used by config/lr_scheduler/cosinelr.yaml."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * step / max(warmup_t, 1)
        t = jnp.clip(step - warmup_t, 0, t_initial - warmup_t)
        cos = lr_min + (base_lr - lr_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / max(t_initial - warmup_t, 1))
        )
        return jnp.where(step < warmup_t, warm, cos)

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.5):
    """torch StepLR."""

    def schedule(step):
        return base_lr * gamma ** (jnp.asarray(step) // step_size)

    return schedule


SCHEDULES = {
    "multi_steplr": multi_step_warmup,
    "cosine_restart": cosine_annealing_restart_cyclic,
    "warmup_cosine": gradual_warmup_cosine,
    "cosinelr": warmup_cosine,
    "steplr": step_lr,
}

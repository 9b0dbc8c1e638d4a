"""PSNR-engine training: pure pjit-able train/eval steps.

Replaces the reference's LightningModule training loop (engines/base.py:221-254)
with a functional train step: forward, weighted loss, grad, optax update — one
compiled program.  Data parallelism comes from sharding the batch over the mesh's
``data`` axis while params stay replicated (grad all-reduce inserted by XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grlir.losses import LOSS_FNS, weighted_loss
from grlir.parallel.mesh import DATA_AXIS, batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params["params"]),
    )


def build_loss(loss_cfg: Mapping[str, float]):
    """{loss_name: weight} -> combinator (engines/base.py:184-204)."""
    return {name: (w, LOSS_FNS[name]) for name, w in loss_cfg.items()}


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: Mapping[str, float],
    mesh: Optional[Mesh] = None,
    preprocess: Optional[Callable] = None,
    donate: bool = True,
    jit_compile: bool = True,
    classification: bool = False,
    one_hot_label: bool = True,
):
    """Build the jitted train step.

    preprocess(batch, rng) -> (lq, gt): on-device task physics (demosaic init,
    kernel blur + noise, progressive crop), mirroring the reference's in-forward
    degradations (engines/base.py:118-165).
    classification: per-pixel 256-way class training — pixel losses on the
    expected image + cross entropy on the distribution (engines/base.py:186-199).
    """
    if classification:
        from grlir.losses.classification import build_classification_loss

        cls_loss = build_classification_loss(
            loss_cfg, LOSS_FNS, one_hot_label=one_hot_label)
    else:
        losses = build_loss(loss_cfg)

    # step-aware preprocess fns (MixUp start gate) take (batch, rng, step)
    import inspect

    pre_takes_step = (
        preprocess is not None
        and len(inspect.signature(preprocess).parameters) >= 3
    )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        prng, drng = jax.random.split(rng)
        if preprocess is not None:
            if pre_takes_step:
                lq, gt = preprocess(batch, prng, state.step)
            else:
                lq, gt = preprocess(batch, prng)
        else:
            lq, gt = batch["img_lq"], batch["img_gt"]

        def loss_fn(params):
            pred = model.apply(
                {"params": params}, lq, deterministic=False,
                rngs={"droppath": drng},
            )
            if classification:
                total, parts = cls_loss(pred, gt)
            else:
                total, parts = weighted_loss(losses, pred, gt)
            return total, parts

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"]
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params["params"]
        )
        params = optax.apply_updates(state.params["params"], updates)
        new_state = TrainState(
            step=state.step + 1,
            params={"params": params},
            opt_state=opt_state,
        )
        metrics = {"loss": total, **{f"loss_{k}": v for k, v in parts.items()}}
        return new_state, metrics

    if not jit_compile:
        # raw step for callers that embed it in a larger program
        # (e.g. lax.scan-amortized throughput measurement)
        return step_fn
    if mesh is not None:
        state_sh = replicated(mesh)
        data_sh = batch_sharding(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data_sh, state_sh),
            out_shardings=(state_sh, state_sh),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Optional[Mesh] = None):
    def eval_fn(params, lq):
        return model.apply(params, lq, deterministic=True)

    if mesh is not None:
        return jax.jit(
            eval_fn,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
    return jax.jit(eval_fn)

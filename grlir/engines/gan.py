"""GAN training engine (BSR stage 2): functional two-optimizer train step.

Replaces the reference GANEngine's Lightning optimizer_idx protocol
(engines/base_gan.py:86-147) with one compiled program doing the explicit
G-then-D alternation: generator loss = pixel + VGG-perceptual + GAN, then
discriminator BCE on real/fake with the generator output detached.  Per-loss
USM-sharpened-target selection follows base_gan.py:99,107,131.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from grlir.losses import LOSS_FNS
from grlir.losses.gan import gan_loss
from grlir.parallel.mesh import batch_sharding, replicated


@dataclass
class GANLossConfig:
    """Mirrors config/loss/gan.yaml semantics."""

    pixel_loss: str = "l1"
    pixel_weight: float = 1.0
    perceptual_layer_weights: Mapping[str, float] = field(
        default_factory=lambda: {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1.0,
                                 "conv4_4": 1.0, "conv5_4": 1.0}
    )
    perceptual_weight: float = 1.0
    gan_type: str = "vanilla"
    gan_weight: float = 0.1
    use_usm_pixel: bool = True
    use_usm_percep: bool = True
    use_usm_gan: bool = False


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    spectral: Any          # discriminator power-iteration vectors
    opt_state_g: Any
    opt_state_d: Any


def create_gan_state(params_g, disc_vars, opt_g, opt_d) -> GANTrainState:
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d={"params": disc_vars["params"]},
        spectral=disc_vars.get("spectral", {}),
        opt_state_g=opt_g.init(params_g["params"]),
        opt_state_d=opt_d.init(disc_vars["params"]),
    )


def make_gan_train_step(
    generator,
    discriminator,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    cfg: GANLossConfig,
    perceptual_fn: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    lightning_parity: bool = False,
):
    """perceptual_fn(pred, target) -> scalar (already layer-weighted); None
    disables the perceptual term (e.g. before VGG weights are provided).

    lightning_parity=False (default): one generator forward per step; the
    discriminator trains on that output detached (BasicSR-style, one forward
    cheaper).  True: reproduce the reference's Lightning optimizer_idx
    protocol bit-for-bit (base_gan.py:86-90 — training_step runs self(batch)
    PER OPTIMIZER, so the D step sees a FRESH forward through the UPDATED
    generator, and the D(fake) call in the G step advances spectral-norm
    power iteration too: 3 iterations per step, not 2).  Used by the
    trajectory-parity tests; costs one extra G forward per step.
    """
    pixel_fn = LOSS_FNS[cfg.pixel_loss]

    def step_fn(state: GANTrainState, batch, rng):
        lq = batch["img_lq"]
        gt = batch["img_gt"]
        gt_usm = batch.get("img_gt_usm", gt)

        t_pix = gt_usm if cfg.use_usm_pixel else gt
        t_per = gt_usm if cfg.use_usm_percep else gt
        t_gan = gt_usm if cfg.use_usm_gan else gt

        def disc_apply(params_d, spectral, x, update):
            variables = {"params": params_d["params"], "spectral": spectral}
            if update:
                return discriminator.apply(variables, x, True,
                                           mutable=["spectral"])
            out = discriminator.apply(variables, x, False)
            return out, {"spectral": spectral}

        # ---- generator step (base_gan.py:96-126)
        def g_loss(pg):
            restored = generator.apply(
                {"params": pg}, lq, deterministic=False,
                rngs={"droppath": rng},
            )
            parts = {}
            total = 0.0
            l_pix = pixel_fn(restored, t_pix) * cfg.pixel_weight
            parts["loss_g_pix"] = l_pix
            total = total + l_pix
            if perceptual_fn is not None:
                l_per = perceptual_fn(restored, t_per) * cfg.perceptual_weight
                parts["loss_g_percep"] = l_per
                total = total + l_per
            # lightning_parity: this train-mode D forward advances the SN
            # power iteration like torch's does; u is a buffer, so the
            # mutation carries no gradient
            fake_pred, vars_g = disc_apply(state.params_d, state.spectral,
                                           restored, update=lightning_parity)
            l_gan = gan_loss(fake_pred, True, cfg.gan_type, is_disc=False,
                             loss_weight=cfg.gan_weight)
            parts["loss_g_gan"] = l_gan
            total = total + l_gan
            parts["loss_g"] = total
            return total, (parts, restored, vars_g["spectral"])

        (l_g, (parts_g, restored, spectral_g)), grads_g = jax.value_and_grad(
            g_loss, has_aux=True)(state.params_g["params"])
        upd_g, opt_state_g = opt_g.update(
            grads_g, state.opt_state_g, state.params_g["params"])
        params_g = optax.apply_updates(state.params_g["params"], upd_g)
        spectral_in = jax.lax.stop_gradient(
            spectral_g) if lightning_parity else state.spectral

        # ---- discriminator step (base_gan.py:129-145)
        if lightning_parity:
            # the reference's Lightning loop calls self(batch) again for
            # optimizer_idx=1, i.e. the D step trains on a fresh forward
            # through the UPDATED generator (base_gan.py:86-90)
            restored_detached = jax.lax.stop_gradient(
                generator.apply({"params": params_g}, lq,
                                deterministic=False, rngs={"droppath": rng}))
        else:
            restored_detached = jax.lax.stop_gradient(restored)

        def d_loss(pd):
            real_pred, vars1 = disc_apply({"params": pd}, spectral_in,
                                          t_gan, update=True)
            l_real = gan_loss(real_pred, True, cfg.gan_type, is_disc=True)
            fake_pred, vars2 = disc_apply({"params": pd}, vars1["spectral"],
                                          restored_detached, update=True)
            l_fake = gan_loss(fake_pred, False, cfg.gan_type, is_disc=True)
            parts = {
                "loss_d_real": l_real,
                "loss_d_fake": l_fake,
                "out_d_real": jnp.mean(real_pred),
                "out_d_fake": jnp.mean(fake_pred),
            }
            return l_real + l_fake, (parts, vars2["spectral"])

        (l_d, (parts_d, spectral)), grads_d = jax.value_and_grad(
            d_loss, has_aux=True)(state.params_d["params"])
        upd_d, opt_state_d = opt_d.update(
            grads_d, state.opt_state_d, state.params_d["params"])
        params_d = optax.apply_updates(state.params_d["params"], upd_d)

        new_state = GANTrainState(
            step=state.step + 1,
            params_g={"params": params_g},
            params_d={"params": params_d},
            spectral=jax.lax.stop_gradient(spectral),
            opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
        )
        metrics = {**parts_g, **parts_d, "loss_d": l_d}
        return new_state, metrics

    if mesh is not None:
        state_sh = replicated(mesh)
        data_sh = batch_sharding(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data_sh, state_sh),
            out_shardings=(state_sh, state_sh),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))

"""N-step GAN training-trajectory parity vs the live torch reference.

The PSNR-engine twin (test_training_dynamics.py) certifies the single-optimizer
loop; this drives the TWO-OPTIMIZER GAN protocol for 12 steps on identical
weights/batches and asserts per-step g/d losses and D outputs track torch.
It reproduces the reference's Lightning optimizer_idx semantics exactly
(engines/base_gan.py:86-147):

  idx0 (G): fresh forward, pixel(USM target) + gan(D(restored)) — the
            train-mode D call advances spectral-norm power iteration;
  idx1 (D): ANOTHER fresh forward through the UPDATED generator,
            BCE real/fake on restored.detach(), two more power iterations.

via make_gan_train_step(lightning_parity=True).  Also covers the SN gradient
convention (u AND v are buffers: grad(sigma) = outer(u, v)) — the one D-side
gradient subtlety a single-step golden test can hide.

No perceptual term (VGG19 weights are external artifacts; the BSR recipe
degrades the same way — VERDICT r3 Missing #2).
"""

import numpy as np
import pytest
import torch

import oracle
from grlir.models import blocks


@pytest.fixture(autouse=True)
def _exact_gelu():
    blocks.set_gelu_mode("exact")
    yield
    blocks.set_gelu_mode("auto")


N_STEPS = 12
LR_G, LR_D = 1e-4, 2e-4
GAN_W, PIX_W = 0.1, 1.0


def _bce_gan(pred, real: bool, is_disc: bool):
    """losses.py:190-293 vanilla GANLoss: BCEWithLogits; G side x loss_weight."""
    target = torch.full_like(pred, 1.0 if real else 0.0)
    loss = torch.nn.functional.binary_cross_entropy_with_logits(pred, target)
    return loss if is_disc else loss * GAN_W


def test_12_step_gan_two_optimizer_trajectory():
    import jax
    import jax.numpy as jnp
    import optax

    from grlir.engines.gan import (GANLossConfig, create_gan_state,
                                   make_gan_train_step)
    from grlir.models.discriminator import UNetDiscriminatorSN
    from grlir.models.grl import GRL, GRLConfig
    from grlir.utils import convert as C

    kw = dict(
        img_size=16, upscale=2, upsampler="pixelshuffledirect",
        depths=[2], embed_dim=32, num_heads_window=[2], num_heads_stripe=[2],
        window_size=4, stripe_size=[4, None], stripe_groups=[None, 2],
        stripe_shift=True, mlp_ratio=2, anchor_window_down_factor=2,
    )
    torch.manual_seed(7)
    tg = oracle.reference_grl(**kw)
    tg.train()

    oracle._install_stubs()
    from models.aux_archs.discriminator import UNetDiscriminatorSN as TorchD

    torch.manual_seed(8)
    td = TorchD(num_in_ch=3, num_feat=16, skip_connection=True)
    # converge SN power iteration before snapshotting (trained ckpts have
    # converged u/v implicitly; unconverged u makes sigma garbage and the
    # jax/torch eval-v conventions only coincide at the fixed point)
    warm = torch.rand(1, 3, 32, 32)
    td.train()
    with torch.no_grad():
        for _ in range(30):
            td(warm)

    # .copy(): state_dict_numpy returns views of the live torch tensors and
    # the torch training loop below mutates them in place
    init_g = {k: v.copy() for k, v in oracle.state_dict_numpy(tg).items()}
    init_d = {k: v.detach().numpy().copy() for k, v in td.state_dict().items()}

    rng = np.random.default_rng(11)
    batches = [
        (rng.random((2, 3, 16, 16)).astype(np.float32),
         rng.random((2, 3, 32, 32)).astype(np.float32),
         rng.random((2, 3, 32, 32)).astype(np.float32))  # distinct USM target
        for _ in range(N_STEPS)
    ]

    # ---- torch trajectory: the reference Lightning protocol, inlined
    opt_g = torch.optim.Adam(tg.parameters(), lr=LR_G, betas=(0.9, 0.999),
                             eps=1e-8)
    opt_d = torch.optim.Adam(td.parameters(), lr=LR_D, betas=(0.9, 0.999),
                             eps=1e-8)
    traj_t = []
    for x, gt, gt_usm in batches:
        xt = torch.from_numpy(x)
        gtt, usmt = torch.from_numpy(gt), torch.from_numpy(gt_usm)
        # optimizer_idx 0: generator (base_gan.py:96-126)
        restored = tg(xt)
        loss_g_pix = torch.nn.functional.l1_loss(restored, usmt) * PIX_W
        fake_g_pred = td(restored)                 # SN power iteration #1
        loss_g_gan = _bce_gan(fake_g_pred, True, is_disc=False)
        loss_g = loss_g_pix + loss_g_gan
        opt_g.zero_grad()
        loss_g.backward()
        opt_g.step()
        # optimizer_idx 1: discriminator — FRESH forward, updated G
        # (base_gan.py:86-90 self(batch) per optimizer)
        restored2 = tg(xt)
        real_d_pred = td(gtt)                      # power iteration #2
        loss_d_real = _bce_gan(real_d_pred, True, is_disc=True)
        fake_d_pred = td(restored2.detach())       # power iteration #3
        loss_d_fake = _bce_gan(fake_d_pred, False, is_disc=True)
        loss_d = loss_d_real + loss_d_fake
        opt_d.zero_grad()
        loss_d.backward()
        opt_d.step()
        traj_t.append(dict(
            loss_g=float(loss_g.detach()), loss_g_pix=float(loss_g_pix.detach()),
            loss_d=float(loss_d.detach()),
            out_d_real=float(real_d_pred.mean()),
            out_d_fake=float(fake_d_pred.mean())))

    # ---- grlir trajectory: the real compiled two-optimizer step
    gcfg = GRLConfig(
        embed_dim=32, upscale=2, upsampler="pixelshuffledirect", depths=(2,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=4,
        stripe_size=(4, None), stripe_groups=(None, 2), stripe_shift=True,
        mlp_ratio=2, anchor_window_down_factor=2, drop_path_rate=0.0,
    )
    gen = GRL(gcfg)
    disc = UNetDiscriminatorSN(num_feat=16)

    xin0 = jnp.asarray(batches[0][0].transpose(0, 2, 3, 1))
    tmpl_g = jax.eval_shape(gen.init, jax.random.PRNGKey(0), xin0)
    params_g = C.convert_torch_state_dict(init_g, tmpl_g)
    gt0 = jnp.asarray(batches[0][1].transpose(0, 2, 3, 1))
    tmpl_d = jax.eval_shape(disc.init, jax.random.PRNGKey(1), gt0)
    vars_d = C.convert_unet_discriminator(init_d, tmpl_d)

    og = optax.adam(LR_G, b1=0.9, b2=0.999, eps=1e-8)
    od = optax.adam(LR_D, b1=0.9, b2=0.999, eps=1e-8)
    state = create_gan_state(params_g, vars_d, og, od)
    cfg = GANLossConfig(use_usm_pixel=True, use_usm_percep=True,
                        use_usm_gan=False, gan_weight=GAN_W,
                        pixel_weight=PIX_W)
    step_fn = make_gan_train_step(gen, disc, og, od, cfg,
                                  perceptual_fn=None, lightning_parity=True)

    key = jax.random.PRNGKey(0)
    traj_j = []
    for x, gt, gt_usm in batches:
        batch = {"img_lq": jnp.asarray(x.transpose(0, 2, 3, 1)),
                 "img_gt": jnp.asarray(gt.transpose(0, 2, 3, 1)),
                 "img_gt_usm": jnp.asarray(gt_usm.transpose(0, 2, 3, 1))}
        state, m = step_fn(state, batch, key)
        traj_j.append({k: float(m[k]) for k in
                       ("loss_g", "loss_g_pix", "loss_d",
                        "out_d_real", "out_d_fake")})

    # per-step parity, tolerance growing with compounding fp32 adam noise
    for i, (t, j) in enumerate(zip(traj_t, traj_j)):
        tol = 1e-3 + 4e-4 * i
        for key_ in ("loss_g", "loss_g_pix", "loss_d"):
            assert j[key_] == pytest.approx(t[key_], rel=tol, abs=tol), (
                f"step {i} {key_}: torch {t[key_]} vs grlir {j[key_]}")
        # raw logits means: abs tolerance (values cross zero)
        for key_ in ("out_d_real", "out_d_fake"):
            assert j[key_] == pytest.approx(t[key_], abs=5e-2 + 1e-2 * i), (
                f"step {i} {key_}: torch {t[key_]} vs grlir {j[key_]}")

    # both optimizers actually trained
    assert traj_t[-1]["loss_g_pix"] < traj_t[0]["loss_g_pix"]
    assert int(state.step) == N_STEPS

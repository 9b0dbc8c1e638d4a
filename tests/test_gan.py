"""Discriminator + GAN engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.engines.gan import (
    GANLossConfig,
    create_gan_state,
    make_gan_train_step,
)
from grlir.losses.gan import gan_loss
from grlir.models.discriminator import (
    SNConv,
    UNetDiscriminatorSN,
    VGGStyleDiscriminator,
)
from grlir.models.grl import GRL, GRLConfig
from grlir.optim import build_optimizer


def test_unet_discriminator_shapes():
    d = UNetDiscriminatorSN(num_feat=16)
    x = jnp.zeros((2, 64, 64, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    y, new_vars = d.apply(variables, x, True, mutable=["spectral"])
    assert y.shape == (2, 64, 64, 1)
    # spectral u vectors updated in train mode
    u0 = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u1 = jax.tree_util.tree_leaves(new_vars["spectral"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))
    # eval mode: no mutation needed
    y2 = d.apply(variables, x, False)
    assert y2.shape == (2, 64, 64, 1)


def test_sn_conv_normalizes_spectral_norm():
    """After many power iterations the effective kernel has sigma ~= 1."""
    m = SNConv(8, (3, 3))
    x = jnp.zeros((1, 8, 8, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    vs = variables
    for _ in range(50):
        _, new = m.apply(vs, x, True, mutable=["spectral"])
        vs = {**vs, "spectral": new["spectral"]}
    k = np.asarray(variables["params"]["kernel"])
    w = k.transpose(3, 2, 0, 1).reshape(8, -1)
    u = np.asarray(jax.tree_util.tree_leaves(vs["spectral"])[0])
    v = w.T @ u
    v /= np.linalg.norm(v)
    sigma_est = u @ (w @ v)
    sigma_true = np.linalg.svd(w, compute_uv=False)[0]
    assert sigma_est == pytest.approx(sigma_true, rel=1e-3)


def test_vgg_style_discriminator():
    d = VGGStyleDiscriminator(num_feat=8, input_size=128)
    x = jnp.zeros((2, 128, 128, 3))
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(variables, x, train=False)
    assert y.shape == (2, 1)


def test_gan_loss_types():
    logits = jnp.asarray([[1.0], [-2.0]])
    for t in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
        g = gan_loss(logits, True, t, is_disc=False, loss_weight=0.1)
        d = gan_loss(logits, False, t, is_disc=True)
        assert np.isfinite(float(g)) and np.isfinite(float(d))


def test_gan_train_step_runs_and_improves():
    gen_cfg = GRLConfig(
        embed_dim=16, upscale=1, upsampler="", depths=(1,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=4,
        mlp_ratio=1, stripe_size=(4, None), stripe_groups=(None, 4),
        stripe_shift=False, anchor_window_down_factor=2, drop_path_rate=0.0,
    )
    gen = GRL(gen_cfg)
    disc = UNetDiscriminatorSN(num_feat=8)

    key = jax.random.PRNGKey(0)
    lq = jax.random.uniform(key, (2, 16, 16, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))

    params_g = gen.init(key, lq)
    disc_vars = disc.init(jax.random.PRNGKey(2), gt)
    opt_g = build_optimizer("adam", learning_rate=1e-3)
    opt_d = build_optimizer("adam", learning_rate=1e-3)
    state = create_gan_state(params_g, disc_vars, opt_g, opt_d)

    step = make_gan_train_step(gen, disc, opt_g, opt_d,
                               GANLossConfig(use_usm_pixel=False))
    batch = {"img_lq": lq, "img_gt": gt}
    metrics_hist = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        assert np.isfinite(m["loss_g"]) and np.isfinite(m["loss_d"])
    # pixel loss should drop as G fits the tiny batch
    assert metrics_hist[-1]["loss_g_pix"] < metrics_hist[0]["loss_g_pix"]
    assert int(state.step) == 5


def test_unet_discriminator_conversion_golden():
    """Converted reference UNetDiscriminatorSN weights reproduce its output."""
    import sys
    sys.path.insert(0, "tests")
    import torch

    import oracle
    from grlir.utils.convert import convert_unet_discriminator

    oracle._install_stubs()
    from models.aux_archs.discriminator import UNetDiscriminatorSN as TorchD

    # deterministic oracle weights: SN power-iteration convergence (and the
    # atol below) depend on the init draw, so an unseeded torch RNG made this
    # test order-dependent (round-2 flake)
    torch.manual_seed(0)
    tm = TorchD(num_in_ch=3, num_feat=16, skip_connection=True)
    x = np.random.default_rng(0).random((2, 3, 32, 32)).astype(np.float32)
    # torch SN initializes u/v randomly: sigma is garbage until power iteration
    # converges, so run some train-mode forwards first (as any trained
    # checkpoint implicitly has)
    tm.train()
    with torch.no_grad():
        for _ in range(20):
            tm(torch.from_numpy(x))
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    d = UNetDiscriminatorSN(num_feat=16)
    xin = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = jax.eval_shape(d.init, jax.random.PRNGKey(0), xin)
    variables = convert_unet_discriminator(sd, template)
    got = np.asarray(d.apply(variables, xin, False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

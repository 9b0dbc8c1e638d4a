"""Discriminators for GAN training (flax, NHWC).

Equivalents of /root/reference/models/aux_archs/discriminator.py:
UNetDiscriminatorSN (the one wired into BSR GAN training,
config/model/grl/grl_base_bsr.yaml:36-40), VGGStyleDiscriminator and
PatchGANDiscriminator.  Spectral norm is a 1-step power iteration per training
forward over the (O, I*kh*kw) matricization, matching torch.nn.utils.spectral_norm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grlir.models.blocks import conv_kernel_init, _conv_bias_init


def _l2n(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization.

    The power-iteration vector `u` lives in the 'spectral' variable collection;
    pass mutable=['spectral'] during training to update it (torch updates u on
    every training forward).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update: bool = True):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_kernel_init, (kh, kw, in_ch, self.features)
        )
        # torch matricization: (O, I*kh*kw); exact layout of the second axis
        # doesn't change sigma, but we keep torch's (O, I, kh, kw) order so a
        # converted `u` vector stays aligned.
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2n(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (self.features,))),
        )
        u = u_var.value
        if update and not self.is_initializing():
            v = _l2n(w_mat.T @ u)
            u = _l2n(w_mat @ v)
            u_var.value = jax.lax.stop_gradient(u)
        else:
            v = _l2n(w_mat.T @ u)
        # torch treats u AND v as buffers: grad(sigma) wrt W is exactly
        # outer(u, v) — without the stop_gradient here the extra path through
        # v = l2n(W^T u) changes D gradients vs the reference
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        kernel = kernel / sigma

        # all SN convs here are 3x3/s1/p1 or 4x4/s2/p1 (torch padding=1)
        y = jax.lax.conv_general_dilated(
            x, kernel, self.strides, [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", _conv_bias_init(in_ch * kh * kw),
                               (self.features,))
        return y


def _bilinear_up2(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")


class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator with spectral norm (discriminator.py:92-145)."""

    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        nf = self.num_feat
        x0 = lrelu(nn.Conv(nf, (3, 3), padding=1, kernel_init=conv_kernel_init,
                           name="conv0")(x))
        x1 = lrelu(SNConv(nf * 2, (4, 4), (2, 2), False, name="conv1")(x0, update_sn))
        x2 = lrelu(SNConv(nf * 4, (4, 4), (2, 2), False, name="conv2")(x1, update_sn))
        x3 = lrelu(SNConv(nf * 8, (4, 4), (2, 2), False, name="conv3")(x2, update_sn))

        x3 = _bilinear_up2(x3)
        x4 = lrelu(SNConv(nf * 4, (3, 3), (1, 1), False, name="conv4")(x3, update_sn))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = _bilinear_up2(x4)
        x5 = lrelu(SNConv(nf * 2, (3, 3), (1, 1), False, name="conv5")(x4, update_sn))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _bilinear_up2(x5)
        x6 = lrelu(SNConv(nf, (3, 3), (1, 1), False, name="conv6")(x5, update_sn))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(SNConv(nf, (3, 3), (1, 1), False, name="conv7")(x6, update_sn))
        out = lrelu(SNConv(nf, (3, 3), (1, 1), False, name="conv8")(out, update_sn))
        return nn.Conv(1, (3, 3), padding=1, kernel_init=conv_kernel_init,
                       name="conv9")(out)


class PatchGANDiscriminator(nn.Module):
    """PatchGAN discriminator (discriminator.py:147-184); VALID 3x3 convs."""

    ndf: int = 64
    n_layers: int = 35

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.ndf, (3, 3), padding="VALID",
                    kernel_init=conv_kernel_init, name="conv_in")(x)
        y = nn.leaky_relu(y, 0.2)
        for i in range(self.n_layers):
            y = nn.Conv(self.ndf, (3, 3), padding="VALID", use_bias=False,
                        kernel_init=conv_kernel_init, name=f"conv_{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}")(y)
            y = nn.leaky_relu(y, 0.2)
        return nn.Conv(1, (3, 3), padding="VALID", use_bias=False,
                       kernel_init=conv_kernel_init, name="conv_out")(y)


class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator for 128/256 inputs (discriminator.py:6-90)."""

    num_feat: int = 64
    input_size: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert x.shape[1] == self.input_size
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        nf = self.num_feat

        def down_block(v, cout, idx, first=False):
            v = nn.Conv(cout, (3, 3), padding=1, use_bias=first,
                        kernel_init=conv_kernel_init, name=f"conv{idx}_0")(v)
            if not first:
                v = bn(f"bn{idx}_0")(v)
            v = lrelu(v)
            v = nn.Conv(cout, (4, 4), (2, 2), padding=1, use_bias=False,
                        kernel_init=conv_kernel_init, name=f"conv{idx}_1")(v)
            v = lrelu(bn(f"bn{idx}_1")(v))
            return v

        feat = down_block(x, nf, 0, first=True)
        feat = down_block(feat, nf * 2, 1)
        feat = down_block(feat, nf * 4, 2)
        feat = down_block(feat, nf * 8, 3)
        feat = down_block(feat, nf * 8, 4)
        if self.input_size == 256:
            feat = down_block(feat, nf * 8, 5)
        feat = feat.reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100, name="linear1")(feat))
        return nn.Dense(1, name="linear2")(feat)

"""EDSR-lineage common blocks (flax, NHWC).

TPU-native equivalents of the reference's EDSR commons:
/root/reference/models/common/resblock.py (ResBlock, ResBlockWrapper) and
/root/reference/models/common/common_edsr.py (MeanShift, BasicBlock, ESA,
ResBlock, Upsampler, LiteUpsampler).  These are dead code in the reference's
GRL path (its own docstring says only edsr_esa.py / ipt.py-style models use
them) but belong to the commons inventory, so they are provided — NHWC, with
torch-convertible parameter shapes (OIHW kernels transpose to HWIO).

Naming: the two reference ResBlocks collide, so the plain conv-relu-conv one
(resblock.py:4) keeps the name ``ResBlock`` and the EDSR/ESA one
(common_edsr.py:121) is ``EDSRResBlock``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from grlir.ops.layout import pixel_shuffle

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def mean_shift(x, rgb_range: float, rgb_mean=_RGB_MEAN,
               rgb_std=(1.0, 1.0, 1.0), sign: int = -1):
    """EDSR MeanShift (common_edsr.py:21-37) as a pure op.

    The torch version is a frozen 1x1 conv with weight eye(3)/std and bias
    sign*rgb_range*mean/std; parameter-free here (it never trains there
    either: requires_grad=False).
    """
    std = jnp.asarray(rgb_std, x.dtype)
    mean = jnp.asarray(rgb_mean, x.dtype)
    return x / std + sign * rgb_range * mean / std


def _conv(x, features: int, kernel: int, *, stride: int = 1,
          padding="SAME", groups: int = 1, use_bias: bool = True, name=None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, feature_group_count=groups,
                   use_bias=use_bias, name=name)(x)


class ResBlock(nn.Module):
    """Conv-ReLU-Conv residual block without BN (resblock.py:4-44)."""

    num_feats: int = 64
    res_scale: float = 1.0
    use_bias: bool = True
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        out = _conv(x, self.num_feats, 3, use_bias=self.use_bias, name="conv1")
        out = _conv(nn.relu(out), self.num_feats, 3, use_bias=self.use_bias,
                    name="conv2")
        out = out * self.res_scale
        return x + out if self.shortcut else out


class ResBlockWrapper(ResBlock):
    """Token-format ResBlock (resblock.py:47-61): (B, L, C) + x_size.

    The reference permutes tokens to NCHW around the convs; grlir is NHWC so
    only the (B, L, C) <-> (B, H, W, C) reshapes remain.
    """

    @nn.compact
    def __call__(self, x, x_size: Tuple[int, int]):
        H, W = x_size
        B, L, C = x.shape
        y = ResBlock.__call__(self, x.reshape(B, H, W, C))
        return y.reshape(B, L, C)


class BasicBlock(nn.Module):
    """Conv [+ BN] [+ act] (common_edsr.py:39-58)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False
    bn: bool = True
    act: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(x, self.features, self.kernel_size, stride=self.stride,
                  use_bias=self.use_bias, name="conv")
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "prelu":
            x = nn.PReLU(name="act")(x)
        return x


class ESA(nn.Module):
    """Enhanced spatial attention (common_edsr.py:61-90)."""

    esa_channels: int
    n_feats: int

    @nn.compact
    def __call__(self, x):
        f = self.esa_channels
        c1_ = _conv(x, f, 1, name="conv1")
        c1 = _conv(c1_, f, 3, stride=2, padding="VALID", name="conv2")
        # max_pool2d(kernel=7, stride=3): torch floors the output size, so
        # clip to full windows ("VALID")
        v_max = nn.max_pool(c1, (7, 7), strides=(3, 3), padding="VALID")
        c3 = _conv(v_max, f, 3, name="conv3")
        # F.interpolate(mode='bilinear', align_corners=False) == half-pixel
        # centers == jax.image.resize 'linear'
        c3 = jax.image.resize(
            c3, (c3.shape[0], x.shape[1], x.shape[2], f), method="linear")
        cf = _conv(c1_, f, 1, name="conv_f")
        c4 = _conv(c3 + cf, self.n_feats, 1, name="conv4")
        return x * jax.nn.sigmoid(c4)


class EDSRResBlock(nn.Module):
    """EDSR ResBlock with optional ESA tail (common_edsr.py:121-166)."""

    n_feats: int
    kernel_size: int = 3
    use_bias: bool = True
    bn: bool = False
    res_scale: float = 1.0
    esa_block: bool = True
    depth_wise_kernel: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        for i in range(2):
            res = _conv(res, self.n_feats, self.kernel_size,
                        use_bias=self.use_bias, name=f"body_conv{i}")
            if self.bn:
                res = nn.BatchNorm(use_running_average=not train,
                                   name=f"body_bn{i}")(res)
            if i == 0:
                res = nn.relu(res)
        res = x + res * self.res_scale
        if self.esa_block:
            res = _conv(res, self.n_feats, self.depth_wise_kernel,
                        groups=self.n_feats, name="c5")
            res = ESA(16, self.n_feats, name="esa")(res)
        return res


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler for scale 2^n or 3 (common_edsr.py:168-196)."""

    scale: int
    n_feats: int
    use_bias: bool = True
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if scale & (scale - 1) == 0:
            steps = [2] * (scale.bit_length() - 1)
        elif scale == 3:
            steps = [3]
        else:
            raise NotImplementedError(f"Upsampler scale {scale}")
        for i, r in enumerate(steps):
            x = _conv(x, r * r * self.n_feats, 3, use_bias=self.use_bias,
                      name=f"conv{i}")
            x = pixel_shuffle(x, r)
            if self.act == "relu":
                x = nn.relu(x)
            elif self.act == "prelu":
                x = nn.PReLU(name=f"act{i}")(x)
        return x


class LiteUpsampler(nn.Module):
    """Single conv to n_out*scale^2 then one shuffle (common_edsr.py:199+)."""

    scale: int
    n_feats: int
    n_out: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = _conv(x, self.n_out * self.scale * self.scale, 3,
                  use_bias=self.use_bias, name="conv0")
        return pixel_shuffle(x, self.scale)

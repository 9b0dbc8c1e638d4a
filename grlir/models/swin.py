"""Legacy Swin v1/v2 window-attention blocks + patch embed helpers.

Inventory parity with the reference's support layers
(/root/reference/models/common/swin_v1_block.py:46-455 and swin_v2_block.py:18-306
— the latter referenced by nothing in the reference either, kept for API
completeness).  v1: pre-norm, learned relative-position-bias table, scaled
dot-product attention.  v2: post-norm, cosine attention with CPB MLP.
Standalone building blocks — the GRL path uses grlir.models.blocks instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grlir.models.blocks import (
    AffineTransform,
    Mlp,
    _merge_heads,
    _split_qkv_heads,
    dense,
    layer_norm,
)
from grlir.ops.geometry import calculate_mask, get_relative_position_index
from grlir.ops.layout import window_partition, window_reverse

Size2 = Tuple[int, int]


class WindowAttentionV1(nn.Module):
    """Swin v1 W-MSA with learned relative position bias table
    (swin_v1_block.py:46-...)."""

    dim: int
    window_size: Size2
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, nW, N, C)
        B, nW, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = dense(x, 3 * C, use_bias=self.qkv_bias, name="qkv")
        q, k, v = _split_qkv_heads(qkv, self.num_heads)
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("...nd,...md->...nm", q, k)

        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        index = jnp.asarray(get_relative_position_index(self.window_size))
        bias = table[index.reshape(-1)].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None, None]
        if mask is not None:
            attn = attn + mask[None, :, None, :, :]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("...nm,...md->...nd", attn, v)
        return dense(_merge_heads(out), C, name="proj")


class SwinTransformerBlockV1(nn.Module):
    """Pre-norm Swin v1 block with optional shifted windows."""

    dim: int
    window_size: Size2
    num_heads: int
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        wh, ww = self.window_size
        shift = (wh // 2, ww // 2) if self.shift else (0, 0)

        shortcut = x
        y = layer_norm(x, name="norm1")
        if self.shift:
            y = jnp.roll(y, (-shift[0], -shift[1]), axis=(1, 2))
        y = window_partition(y, self.window_size)
        mask = (jnp.asarray(calculate_mask((H, W), self.window_size, shift))
                if self.shift else None)
        y = WindowAttentionV1(self.dim, self.window_size, self.num_heads,
                              name="attn")(y, mask)
        y = window_reverse(y, self.window_size, (H, W))
        if self.shift:
            y = jnp.roll(y, shift, axis=(1, 2))
        x = shortcut + y
        return x + Mlp(int(self.dim * self.mlp_ratio), self.dim,
                       name="mlp")(layer_norm(x, name="norm2"))


class WindowAttentionV2(nn.Module):
    """Swin v2 W-MSA: cosine attention + continuous position bias
    (swin_v2_block.py:18-...).  Reuses the shared AffineTransform."""

    dim: int
    window_size: Size2
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, table, index, mask=None):
        B, nW, N, C = x.shape
        qkv = dense(x, 3 * C, use_bias=self.qkv_bias, name="qkv")
        q, k, v = _split_qkv_heads(qkv, self.num_heads)

        def norm(t):
            n = jnp.sqrt(jnp.sum(t * t, -1, keepdims=True))
            return t / jnp.maximum(n, 1e-12)

        attn = jnp.einsum("...nd,...md->...nm", norm(q), norm(k))
        attn = AffineTransform(self.num_heads, name="attn_transform")(
            attn, table, index, mask)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("...nm,...md->...nd", attn, v)
        return dense(_merge_heads(out), C, name="proj")


class SwinTransformerBlockV2(nn.Module):
    """Post-norm Swin v2 block."""

    dim: int
    window_size: Size2
    num_heads: int
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, table, index):
        from grlir.ops.geometry import calculate_mask

        B, H, W, C = x.shape
        wh, ww = self.window_size
        shift = (wh // 2, ww // 2) if self.shift else (0, 0)

        y = x
        if self.shift:
            y = jnp.roll(y, (-shift[0], -shift[1]), axis=(1, 2))
        y = window_partition(y, self.window_size)
        mask = (jnp.asarray(calculate_mask((H, W), self.window_size, shift))
                if self.shift else None)
        y = WindowAttentionV2(self.dim, self.window_size, self.num_heads,
                              name="attn")(y, table, index, mask)
        y = window_reverse(y, self.window_size, (H, W))
        if self.shift:
            y = jnp.roll(y, shift, axis=(1, 2))
        x = x + layer_norm(y, name="norm1")
        return x + layer_norm(
            Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(x),
            name="norm2")


class PatchEmbed(nn.Module):
    """Image -> token embedding (swin_v1_block.py:324-...); NHWC stays spatial,
    with an optional norm like the reference."""

    embed_dim: int
    patch_size: int = 1
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        if self.patch_size > 1:
            B, H, W, C = x.shape
            p = self.patch_size
            x = x.reshape(B, H // p, p, W // p, p, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p, p * p * C)
        x = dense(x, self.embed_dim, name="proj")
        if self.use_norm:
            x = layer_norm(x, name="norm")
        return x


class PatchUnEmbed(nn.Module):
    """Tokens -> image (identity reshape in NHWC; kept for API parity)."""

    @nn.compact
    def __call__(self, x):
        return x

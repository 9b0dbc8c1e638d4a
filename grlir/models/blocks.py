"""GRL building blocks (flax.linen, NHWC).

Functionally equivalent to the reference's efficient mixed-attention block family
(/root/reference/models/common/mixed_attn_block_efficient.py and the reusable pieces
in mixed_attn_block.py), re-designed for XLA: features stay NHWC, windows are an
explicit tensor axis (batched einsum attention instead of fold-into-batch), and all
geometry (tables/indices/masks) arrives as precomputed constants.

Layers are created through thin `conv2d`/`dense`/`layer_norm` helpers that attach
primitives directly to the calling module, so the flax param tree mirrors the
reference's state_dict names (see grlir.utils.convert).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grlir.ops.geometry import get_stripe_info
from grlir.ops.layout import (
    window_partition,
    window_partition_cm,
    window_reverse,
    window_reverse_cm,
)

Size2 = Tuple[int, int]


# torch nn.Linear/nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on the weight
# → U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise.
def _fan_in_uniform():
    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


conv_kernel_init = _fan_in_uniform()
# GRL._init_weights (grl.py:455-469): Linear weights trunc_normal(std=0.02), zero bias.
dense_kernel_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _conv_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d(x, features: int, kernel_size: Size2 = (3, 3), strides: Size2 = (1, 1),
           use_bias: bool = True, groups: int = 1, *, name: str, dtype=None):
    """Conv with torch-default init attached directly to the calling module.

    `dtype` is the computation dtype (params stay float32); bf16 keeps the MXU
    fed and halves HBM traffic on the bandwidth-bound GRL workload."""
    in_ch = x.shape[-1]
    fan_in = (in_ch // groups) * int(np.prod(kernel_size))
    return nn.Conv(
        features,
        kernel_size,
        strides=strides,
        padding=[(k // 2, k // 2) for k in kernel_size],
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_init=conv_kernel_init,
        bias_init=_conv_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )(x)


class PermutedOutConv(nn.Module):
    """3x3 SAME conv whose OUTPUT channels are permuted at trace time.

    Params are stored in the torch channel order (so checkpoints convert
    unchanged, param path = {name}/kernel|bias exactly like conv2d's
    nn.Conv) but the kernel/bias are re-indexed by ``perm`` before the conv
    — a sub-MB gather — so downstream ops can assume the permuted order
    (used to feed the reshape-only pixel_shuffle_jic)."""

    features: int
    perm: Tuple[int, ...]
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * 9
        k = self.param("kernel", conv_kernel_init, (3, 3, in_ch, self.features))
        b = self.param("bias", _conv_bias_init(fan_in), (self.features,))
        perm = jnp.asarray(np.asarray(self.perm, np.int32))
        kp, bp = k[..., perm], b[perm]
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kp.astype(dt), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bp.astype(dt)


class ConvIO(nn.Module):
    """3x3 SAME conv with configurable input/output dimension orders.

    Params are bit-identical to conv2d's nn.Conv (HWIO kernel + bias at the
    same param paths), so checkpoints convert unchanged; only the activation
    layout differs.  Purpose: tensors whose channel count is far below the
    TPU's 128-lane tile (the ×4 tail's C=3 output pads 43x, CAB's C/4
    compress stage pads 2.8x) can live channel-major ((N, C, H, W):
    trailing dims (H, W), zero padding) for exactly the ops between two
    layout-friendly boundaries (post-v3 HLO audits, PERF_ANALYSIS round 5)."""

    features: int
    dn: Tuple[str, str, str] = ("NHWC", "HWIO", "NHWC")
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1] if self.dn[0] == "NCHW" else x.shape[-1]
        fan_in = in_ch * 9
        k = self.param("kernel", conv_kernel_init,
                       (3, 3, in_ch, self.features))
        b = self.param("bias", _conv_bias_init(fan_in), (self.features,))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=self.dn,
        )
        bshape = (1, -1, 1, 1) if self.dn[2] == "NCHW" else (1, 1, 1, -1)
        return y + b.astype(dt).reshape(bshape)


def dense(x, features: int, use_bias: bool = True, *, name: str, dtype=None):
    """Linear with the reference's trunc-normal(0.02)/zero-bias init."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=dense_kernel_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )(x)


def layer_norm(x, *, name: str):
    # always normalize in float32 for stability; cast back to the input dtype
    y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)(
        x.astype(jnp.float32))
    return y.astype(x.dtype)


# GELU implementation choice (read at import):
#   fp32 compute -> exact erf (the torch nn.GELU default; golden parity).
#   bf16 compute -> tanh approximation: its output delta vs exact is
#     8.5e-5 max / 94.7 dB PSNR (measured whole-model), far below bf16's
#     own 67 dB rounding vs fp32, and it buys +11% throughput (2.60 ->
#     2.88 MP/s GRL-S 256²) — the erf lowering is transcendental-heavy
#     and duplicated across fusions.
# Overrides: GRLIR_GELU_TANH=1 forces tanh everywhere,
#            GRLIR_GELU_EXACT=1 forces exact erf everywhere,
#            or call set_gelu_mode("tanh"|"exact"|"auto") from code.
# Read at TRACE time (gelu runs only while tracing), so parity runs can
# flip the mode after import — a round-2 advisor finding.
_GELU_MODE = None  # None = defer to env / dtype default


def set_gelu_mode(mode):
    """mode: 'tanh' | 'exact' | 'auto' (dtype-based default)."""
    global _GELU_MODE
    assert mode in ("tanh", "exact", "auto"), mode
    _GELU_MODE = None if mode == "auto" else mode


def gelu(x):
    mode = _GELU_MODE
    if mode is None:
        if os.environ.get("GRLIR_GELU_TANH", "0") == "1":
            mode = "tanh"
        elif os.environ.get("GRLIR_GELU_EXACT", "0") == "1":
            mode = "exact"
    approx = (mode == "tanh"
              or (mode is None and x.dtype == jnp.bfloat16))
    return jax.nn.gelu(x, approximate=approx)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth on the batch axis (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """Per-pixel 2-layer MLP (swin_v1_block.py:15-43)."""

    hidden_features: int
    out_features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = dense(x, self.hidden_features, name="fc1", dtype=self.dtype)
        x = gelu(x)
        return dense(x, self.out_features, name="fc2", dtype=self.dtype)


class CPBMlp(nn.Module):
    """Continuous position bias MLP: 2 -> 512 -> heads (mixed_attn_block.py:24-31)."""

    out_features: int
    hidden: int = 512

    @nn.compact
    def __call__(self, x):
        x = dense(x, self.hidden, name="fc1")
        x = nn.relu(x)
        return dense(x, self.out_features, use_bias=False, name="fc2")


# factored-bias contraction layout; see AffineTransform.bias
_BIAS_PAIR_FLAT = False


def set_bias_pair_flat(on: bool):
    global _BIAS_PAIR_FLAT
    _BIAS_PAIR_FLAT = bool(on)


class AffineTransform(nn.Module):
    """Scale + continuous-position-bias + shift-mask on an attention map.

    attn: (B, nWin, heads, N1, N2).  Matches mixed_attn_block_efficient.py:23-58:
    learned per-head logit scale clamped at log(100), bias = 16*sigmoid(MLP(table))
    gathered by a static index, additive {0,-100} mask for shifted windows.

    setup-style so the fused Pallas path can read (logit_scale, bias) without
    applying them (grlir.ops.pallas.attention).
    """

    num_heads: int

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, math.log(10.0), jnp.float32),
            (self.num_heads, 1, 1),
        )
        self.cpb_mlp = CPBMlp(self.num_heads, name="cpb_mlp")

    def bias(self, table, index, factors=None, out_dtype=None):
        """(heads, N1, N2) continuous position bias.

        With ``factors`` (the (Y1,Y2,Th)/(X1,X2,Tw) one-hot pair from
        ops/geometry.py:get_bias_factors) the block-Toeplitz bias matrix is
        built by two small fp32 MATMULS over the (Th, Tw) table — exact
        (one selected term per output, fp32 accumulate) and ~100x faster
        than gathering: a 4M-element gather costs ~9 ms on TPU regardless
        of layout (measured: row/column/lax.gather variants all ~9 ms,
        per-head 1D gathers 100 ms), which made the CPB gathers ~70% of a
        GRL-base window-32 tile.  The gather fallback serves callers
        without factor geometry (ablations, external indices); it keeps
        the sigmoid on the small table and the big output token-minor —
        heads-minor layouts pad 2-6 heads to 128 lanes (43x traffic).
        """
        bias_table = self.cpb_mlp(table)  # (1, Th, Tw, heads)
        h = self.num_heads
        if factors is not None:
            py, px = factors
            c = 16.0 * jax.nn.sigmoid(
                bias_table.reshape(py.shape[-1], px.shape[-1], h))
            # under a bf16 consumer, run the whole chain in bf16: the
            # one-hot contractions select a single term per output, so
            # bf16(matmul) == bf16(gather) exactly while the materialized
            # (h, N1, N2) product halves (it is the largest bias tensor at
            # big stripe geometries)
            dt = out_dtype or jnp.float32
            if _BIAS_PAIR_FLAT:
                # pair-flattened form (VERDICT r2 #2): contract over
                # (Y1*Y2, Th) x (Th, Tw, h) x (X1*X2, Tw) so the einsum
                # output (h, Y1Y2, X1X2) keeps a wide unpadded minor dim,
                # then pay ONE documented transpose into (h, N1, N2).  The
                # direct 5D form's (h, Y1, X1, Y2, X2) output pads its
                # (Y2, X2) minor tile 2-4x at big geometries.  Same
                # one-term-per-output selection — bit-exact either way.
                Y1, Y2, Th = py.shape
                X1, X2, Tw = px.shape
                out = jnp.einsum(
                    "pt,tuh,qu->hpq",
                    py.reshape(Y1 * Y2, Th).astype(dt), c.astype(dt),
                    px.reshape(X1 * X2, Tw).astype(dt),
                    preferred_element_type=dt)
                out = out.reshape(h, Y1, Y2, X1, X2).transpose(0, 1, 3, 2, 4)
                return out.reshape(h, Y1 * X1, Y2 * X2)
            out = jnp.einsum("abt,tuh,cdu->hacbd", py.astype(dt),
                             c.astype(dt), px.astype(dt),
                             preferred_element_type=dt)
            return out.reshape(
                h, py.shape[0] * px.shape[0], py.shape[1] * px.shape[1])
        bt = 16.0 * jax.nn.sigmoid(bias_table.reshape(-1, h).T)
        if out_dtype is not None:
            bt = bt.astype(out_dtype)
        return bt[:, index]  # (heads, N1, N2)

    def __call__(self, attn, table, index, mask, factors=None):
        # compute in attn's dtype so a bf16 attention matrix stays bf16
        scale = jnp.exp(jnp.minimum(self.logit_scale, math.log(1.0 / 0.01)))
        attn = attn * scale.astype(attn.dtype)
        attn = attn + self.bias(
            table, index, factors, out_dtype=attn.dtype)[None, None]
        if mask is not None:
            attn = attn + mask.astype(attn.dtype)[None, :, None, :, :]
        return attn


# token count above which the fused path uses the flash-tiled kernel
# (ops/pallas/flash_attention.py) instead of the whole-window v2 kernel
_FLASH_MIN_TOKENS = 256



def _split_qkv_cm(qkv, h):
    """(B, nW, 3C, N) channel-major qkv -> three (B, nW, h, d, N).

    Slice the 3C axis FIRST (non-minor slice: stays in the parent layout),
    then reshape each slice.  The reshape-to-6D-then-index order showed as
    a (B, nW, 3, h, d, N) copy per attention in the entry-HLO audit
    (~1.6 GB/forward at GRL-S 256²); wall-clock measured NEUTRAL after the
    change (2.44/2.20 MP/s at 256/384) — XLA overlapped those copies —
    but this form keeps them out of the program entirely."""
    B, nW, C3, N = qkv.shape
    C = C3 // 3
    return tuple(
        qkv[:, :, i * C:(i + 1) * C].reshape(B, nW, h, C // h, N)
        for i in range(3))


def _l2_normalize(x, eps=1e-12, axis=-1):
    # torch F.normalize: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def cosine_attention(q, k, v, transform, table, index, mask,
                     euclidean_dist: bool = False, use_pallas: bool = False,
                     d_major: bool = False, factors=None):
    """Shared attention core (mixed_attn_block_efficient.py:77-94).

    Default layout: q (B, nW, heads, N1, d); k, v (B, nW, heads, N2, d)
    -> (B, nW, heads, N1, d).  With ``d_major=True`` all four are
    (B, nW, heads, d, N) instead — on TPU the minor dimension is padded to
    128 lanes, so a 32-wide head dim as minor costs 4x HBM; putting the
    token axis minor (N >= 64) halves the padded footprint of every
    attention operand.  use_pallas routes through the fused VMEM kernel
    (inference path).
    """
    if use_pallas and not euclidean_dist:
        from grlir.ops.pallas.attention import fused_cosine_attention_auto

        if d_major:
            q, k, v = (jnp.swapaxes(t, -1, -2) for t in (q, k, v))
        out = fused_cosine_attention_auto(
            q, k, v, transform.logit_scale,
            transform.bias(table, index, factors), mask)
        return jnp.swapaxes(out, -1, -2) if d_major else out
    if euclidean_dist and d_major:
        q, k, v = (jnp.swapaxes(t, -1, -2) for t in (q, k, v))
        out = cosine_attention(q, k, v, transform, table, index, mask,
                               euclidean_dist=True)
        return jnp.swapaxes(out, -1, -2)
    # Attention matrices live in the compute dtype: under bf16 this halves the
    # dominant HBM traffic (QK^T out + softmax in/out + AV in).  The MXU always
    # accumulates fp32 internally, so a native bf16-out einsum loses nothing vs
    # an explicit fp32->bf16 round trip (and compiles much faster); fp32 inputs
    # keep the explicit fp32 accumulation.
    acc = (dict(preferred_element_type=jnp.float32)
           if q.dtype == jnp.float32 else {})
    if euclidean_dist:
        attn = jnp.linalg.norm(q[..., :, None, :] - k[..., None, :, :], axis=-1)
    elif d_major:
        attn = jnp.einsum(
            "...dn,...dm->...nm",
            _l2_normalize(q, axis=-2),
            _l2_normalize(k, axis=-2),
            **acc,
        )
    else:
        attn = jnp.einsum(
            "...nd,...md->...nm",
            _l2_normalize(q),
            _l2_normalize(k),
            **acc,
        )
    attn = transform(attn, table, index, mask, factors)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    if d_major:
        out = jnp.einsum("...nm,...dm->...dn", attn, v, **acc)
    else:
        out = jnp.einsum("...nm,...md->...nd", attn, v, **acc)
    return out.astype(v.dtype)


def _split_heads(x, num_heads, d_major: bool = False):
    """(B, nW, N, C) -> (B, nW, heads, N, C/heads), or (B, nW, heads, C/heads, N)
    when d_major.

    The d_major path transposes to channel-major FIRST and only then splits
    heads: the split then touches non-minor dims only (a free bitcast).  The
    naive reshape-then-transpose materializes a (..., heads, d) intermediate
    whose trailing dims pad to the (16, 128) TPU tile — a 32x blowup for
    2 heads x 32 dims (1.8 GB per block at 384²; the dominant term of the
    whole-model HBM roofline)."""
    B, nW, N, C = x.shape
    if d_major:
        x = jnp.swapaxes(x, -1, -2)  # (B, nW, C, N): 2x-padded copy, once
        return x.reshape(B, nW, num_heads, C // num_heads, N)
    x = x.reshape(B, nW, N, num_heads, C // num_heads)
    return x.transpose(0, 1, 3, 2, 4)


def _merge_heads(x, d_major: bool = False):
    """(B, nW, heads, N, d) [or (B, nW, heads, d, N) when d_major]
    -> (B, nW, N, heads*d)."""
    if d_major:
        # merge (heads, d) while still channel-major (free), then one swap
        B, nW, H, d, N = x.shape
        return jnp.swapaxes(x.reshape(B, nW, H * d, N), -1, -2)
    B, nW, H, N, d = x.shape
    return x.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, H * d)


def _split_qkv_heads(qkv, num_heads, d_major: bool = False):
    """(B, nW, N, 3C) -> three (B, nW, heads, N, C/heads) [token-minor
    (B, nW, heads, C/heads, N) when d_major], matching the reference channel
    order [3, heads, head_dim].

    d_major transposes to channel-major first so the [3, heads, d] split is
    a non-minor reshape (free); see _split_heads for why the naive order
    costs a 32x-padded intermediate."""
    B, nW, N, C3 = qkv.shape
    C = C3 // 3
    if d_major:
        x = jnp.swapaxes(qkv, -1, -2)  # (B, nW, 3C, N)
        x = x.reshape(B, nW, 3, num_heads, C // num_heads, N)
        return x[:, :, 0], x[:, :, 1], x[:, :, 2]
    qkv = qkv.reshape(B, nW, N, 3, num_heads, C // num_heads)
    q, k, v = (jnp.moveaxis(qkv[..., i, :, :], -2, 2) for i in range(3))
    return q, k, v


class WindowAttention(nn.Module):
    """Square-window attention with optional half-window cyclic shift
    (mixed_attn_block_efficient.py:97-165)."""

    window_size: Size2
    num_heads: int
    window_shift: bool
    euclidean_dist: bool = False
    use_pallas: bool = False
    d_major: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, qkv, table, index, mask, bands=None,
                 wqkv=None, bqkv=None, factors=None):
        # legacy: qkv (B, H, W, 3*Cw).  Boundary-fused (attn_io="cm"): qkv is
        # the block INPUT x (B, H, W, C) and (wqkv, bqkv) is this half's slice
        # of the shared projection — roll/partition then touch the C-wide x
        # instead of the 1.5C-wide qkv, and the channel-major dense output
        # makes the head split free (no swapaxes copy).
        if wqkv is not None:
            return self._forward_cm(qkv, table, index, mask, bands,
                                    wqkv, bqkv, factors)
        B, H, W, _ = qkv.shape
        shift = self.window_size[0] // 2 if self.window_shift else 0

        if shift > 0:
            qkv = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))

        qkv = window_partition(qkv, self.window_size)  # (B, nW, N, 3C)
        transform = AffineTransform(self.num_heads, name="attn_transform")

        if self.use_pallas and not self.euclidean_dist:
            # v2 fused path: head split, both matmuls, bias/mask/softmax and
            # head merge all in VMEM — per-head tensors and attention
            # matrices never reach HBM
            from grlir.ops.pallas.attention import fused_window_attention_qkv

            if self.window_shift and bands is None:
                # the fused kernel builds the shift mask from band ids;
                # silently dropping it would corrupt shifted windows
                raise ValueError(
                    "use_pallas window attention with window_shift requires "
                    "band ids (geometry['bands_w'])")
            x = fused_window_attention_qkv(
                qkv, transform.logit_scale,
                transform.bias(table, index, factors),
                self.num_heads, bands if self.window_shift else None)
        else:
            q, k, v = _split_qkv_heads(qkv, self.num_heads, self.d_major)
            x = cosine_attention(q, k, v, transform, table, index,
                                 mask if self.window_shift else None,
                                 self.euclidean_dist, False, self.d_major,
                                 factors)
            x = _merge_heads(x, self.d_major)
        x = window_reverse(x, self.window_size, (H, W))
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x

    def _forward_cm(self, x, table, index, mask, bands, wqkv, bqkv,
                    factors=None):
        """Boundary-fused window attention: one channel-major partition copy,
        head split/merge as free reshapes, channel-major reverse."""
        B, H, W, _ = x.shape
        h = self.num_heads
        shift = self.window_size[0] // 2 if self.window_shift else 0
        if self.use_pallas == "v3":
            # v3 whole-half kernel: qkv + partition + attention + reverse all
            # inside one pallas_call; x goes in NHWC, y comes out NHWC
            # (ops/pallas/block_attn.py).  The input roll moves INTO the
            # kernel too (stitched half-window row reads + column rotate);
            # only the output un-roll stays outside.  Geometries whose
            # packed bias exceeds VMEM (GRL-base w32) fall through to the
            # XLA cm path below.
            from grlir.ops.pallas.block_attn import (fused_window_half,
                                                     window_half_supported)

            if window_half_supported((H, W), tuple(self.window_size), h):
                if self.window_shift and bands is None:
                    raise ValueError(
                        "use_pallas='v3' window attention with window_shift "
                        "requires band ids (geometry['bands_w'])")
                transform = AffineTransform(h, name="attn_transform")
                y = fused_window_half(
                    x, wqkv, bqkv, transform.logit_scale,
                    transform.bias(table, index, factors),
                    tuple(self.window_size),
                    bands=bands if self.window_shift else None,
                    shift=shift)
                if shift > 0:
                    y = jnp.roll(y, (shift, shift), axis=(1, 2))
                return y
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        # v3 geometries that failed the VMEM guard run plain XLA, not the
        # v1/v2/flash engines (those lose at exactly the large-N geometries
        # the guard rejects — PERF_ANALYSIS.md)
        use_pallas = False if self.use_pallas == "v3" else self.use_pallas
        xw = window_partition_cm(x, self.window_size)  # (B, nW, C, N)
        transform = AffineTransform(h, name="attn_transform")

        N_tok = self.window_size[0] * self.window_size[1]
        if use_pallas and not self.euclidean_dist:
            if self.window_shift and bands is None:
                raise ValueError(
                    "use_pallas window attention with window_shift requires "
                    "band ids (geometry['bands_w'])")
            if N_tok > _FLASH_MIN_TOKENS:
                from grlir.ops.pallas.flash_attention import flash_rect_attention

                q, k, v = _qkv_cm_heads(xw, wqkv, bqkv, self.dtype, h)
                Bq, nW, _, d, N = q.shape
                wb = bands if self.window_shift else None
                y = flash_rect_attention(
                    q, k, v, transform.logit_scale,
                    transform.bias(table, index, factors,
                                   out_dtype=q.dtype),
                    bands_q=wb, bands_k=wb)
                y = y.reshape(Bq, nW, h * d, N)
            else:
                from grlir.ops.pallas.attention import fused_window_attention_qkv

                qkv = _qkv_cm(xw, wqkv, bqkv, self.dtype)  # (B, nW, 3Cw, N)
                y = fused_window_attention_qkv(
                    qkv, transform.logit_scale,
                    transform.bias(table, index, factors),
                    h, bands if self.window_shift else None,
                    channel_major=True)
        else:
            q, k, v = _qkv_cm_heads(xw, wqkv, bqkv, self.dtype, h)
            Bq, nW, _, d, N = q.shape
            y = cosine_attention(q, k, v, transform, table, index,
                                 mask if self.window_shift else None,
                                 self.euclidean_dist, False, True, factors)
            y = y.reshape(Bq, nW, h * d, N)  # merge heads (free, channel-major)
        y = window_reverse_cm(y, self.window_size, (H, W))
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y


class AnchorStripeAttention(nn.Module):
    """Anchored stripe attention — the O(N) global path
    (mixed_attn_block_efficient.py:177-270).

    Global interaction is routed through a down_factor×-downsampled anchor:
    first attn(anchor, K)·V aggregates the stripe into anchor tokens, then
    attn(Q, anchor) redistributes — two skinny matmuls instead of one N×N.
    """

    stripe_size_cfg: Tuple[Optional[int], Optional[int]]
    stripe_groups_cfg: Tuple[Optional[int], Optional[int]]
    stripe_shift: bool
    num_heads: int
    anchor_window_down_factor: int
    euclidean_dist: bool = False
    use_pallas: bool = False
    d_major: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, qkv, anchor, table, index_a2w, index_w2a, mask_a2w,
                 mask_w2a, wqkv=None, bqkv=None, bands=None, bands_a=None,
                 fac_a2w=None, fac_w2a=None):
        # legacy: qkv (B, H, W, 3*Cs).  Boundary-fused (attn_io="cm"): qkv is
        # the block input x (B, H, W, C) + this half's projection slice (see
        # WindowAttention).  anchor: (B, H/df, W/df, Cs) either way.
        B, H, W, _ = qkv.shape
        df = self.anchor_window_down_factor

        stripe_size, shift_size = get_stripe_info(
            self.stripe_size_cfg, self.stripe_groups_cfg, self.stripe_shift, (H, W)
        )
        anchor_stripe = tuple(s // df for s in stripe_size)
        anchor_shift = tuple(s // df for s in shift_size)

        if wqkv is not None:
            return self._forward_cm(
                qkv, anchor, table, index_a2w, index_w2a, mask_a2w, mask_w2a,
                wqkv, bqkv, stripe_size, shift_size, anchor_stripe,
                anchor_shift, bands, bands_a, fac_a2w, fac_w2a)

        if self.stripe_shift:
            qkv = jnp.roll(qkv, (-shift_size[0], -shift_size[1]), axis=(1, 2))
            anchor = jnp.roll(anchor, (-anchor_shift[0], -anchor_shift[1]), axis=(1, 2))

        qkv = window_partition(qkv, stripe_size)  # (B, nW, N1, 3C)
        anchor = window_partition(anchor, anchor_stripe)  # (B, nW, N2, C)

        q, k, v = _split_qkv_heads(qkv, self.num_heads, self.d_major)
        a = _split_heads(anchor, self.num_heads, self.d_major)

        t1 = AffineTransform(self.num_heads, name="attn_transform1")
        t2 = AffineTransform(self.num_heads, name="attn_transform2")
        m_a2w = mask_a2w if self.stripe_shift else None
        m_w2a = mask_w2a if self.stripe_shift else None

        x = cosine_attention(a, k, v, t1, table, index_a2w, m_a2w,
                             self.euclidean_dist, self.use_pallas,
                             self.d_major, fac_a2w)
        x = cosine_attention(q, a, x, t2, table, index_w2a, m_w2a,
                             self.euclidean_dist, self.use_pallas,
                             self.d_major, fac_w2a)

        x = _merge_heads(x, self.d_major)
        x = window_reverse(x, stripe_size, (H, W))
        if self.stripe_shift:
            x = jnp.roll(x, shift_size, axis=(1, 2))
        return x

    def _forward_cm(self, x, anchor, table, index_a2w, index_w2a, mask_a2w,
                    mask_w2a, wqkv, bqkv, stripe_size, shift_size,
                    anchor_stripe, anchor_shift, bands=None, bands_a=None,
                    fac_a2w=None, fac_w2a=None):
        """Boundary-fused anchored stripe attention (see WindowAttention
        _forward_cm): channel-major partition + free head splits."""
        B, H, W, _ = x.shape
        h = self.num_heads
        if self.stripe_shift:
            # the x roll moves INTO the v3 kernel when supported
            # (fused_stripe_half handles the fallback roll itself); the
            # anchor is df^2-times smaller — roll it here either way
            anchor = jnp.roll(anchor, (-anchor_shift[0], -anchor_shift[1]),
                              axis=(1, 2))

        if self.use_pallas == "v3":
            # v3 whole-half kernel: qkv + partition + both attentions +
            # reverse inside one pallas_call (ops/pallas/block_attn.py).
            # Unsupported geometries fall through to the XLA cm path below.
            from grlir.ops.pallas.block_attn import (fused_stripe_half,
                                                     stripe_half_supported)

            if stripe_half_supported((H, W), tuple(stripe_size),
                                     self.anchor_window_down_factor, h):
                if self.stripe_shift and (bands is None or bands_a is None):
                    raise ValueError(
                        "use_pallas='v3' stripe attention with stripe_shift "
                        "requires band ids "
                        "(geometry['bands_{s}'/'bands_{s}_a'])")
                t1 = AffineTransform(h, name="attn_transform1")
                t2 = AffineTransform(h, name="attn_transform2")
                y = fused_stripe_half(
                    x, anchor, wqkv, bqkv, t1.logit_scale, t2.logit_scale,
                    t1.bias(table, index_a2w, fac_a2w),
                    t2.bias(table, index_w2a, fac_w2a),
                    tuple(stripe_size), self.anchor_window_down_factor,
                    bands=bands if self.stripe_shift else None,
                    bands_a=bands_a if self.stripe_shift else None,
                    shift=tuple(shift_size) if self.stripe_shift else (0, 0))
                if self.stripe_shift:
                    y = jnp.roll(y, shift_size, axis=(1, 2))
                return y
        if self.stripe_shift:
            x = jnp.roll(x, (-shift_size[0], -shift_size[1]), axis=(1, 2))

        # see WindowAttention._forward_cm: v3 VMEM-guard fallback runs XLA
        use_pallas = False if self.use_pallas == "v3" else self.use_pallas
        xw = window_partition_cm(x, stripe_size)        # (B, nW, C, N1)
        anchor = window_partition_cm(anchor, anchor_stripe)  # (B, nW, Cs, N2)

        q, k, v = _qkv_cm_heads(xw, wqkv, bqkv, self.dtype, h)
        Bq, nW, _, _, N1 = q.shape
        Cs = wqkv.shape[1] // 3
        a = anchor.reshape(Bq, nW, h, Cs // h, -1)
        N2 = a.shape[-1]

        t1 = AffineTransform(h, name="attn_transform1")
        t2 = AffineTransform(h, name="attn_transform2")

        if (use_pallas and not self.euclidean_dist
                and max(N1, N2) > _FLASH_MIN_TOKENS
                and (not self.stripe_shift
                     or (bands is not None and bands_a is not None))):
            # large-geometry route: per-tile fused attention, matrices never
            # reach HBM (ops/pallas/flash_attention.py)
            from grlir.ops.pallas.flash_attention import flash_rect_attention

            shift = self.stripe_shift
            y = flash_rect_attention(
                a, k, v, t1.logit_scale,
                t1.bias(table, index_a2w, fac_a2w, out_dtype=k.dtype),
                bands_q=bands_a if shift else None,
                bands_k=bands if shift else None)
            y = flash_rect_attention(
                q, a, y, t2.logit_scale,
                t2.bias(table, index_w2a, fac_w2a, out_dtype=q.dtype),
                bands_q=bands if shift else None,
                bands_k=bands_a if shift else None)
        else:
            m_a2w = mask_a2w if self.stripe_shift else None
            m_w2a = mask_w2a if self.stripe_shift else None
            y = cosine_attention(a, k, v, t1, table, index_a2w, m_a2w,
                                 self.euclidean_dist, use_pallas, True,
                                 fac_a2w)
            y = cosine_attention(q, a, y, t2, table, index_w2a, m_w2a,
                                 self.euclidean_dist, use_pallas, True,
                                 fac_w2a)

        y = y.reshape(Bq, nW, Cs, N1)  # merge heads (free, channel-major)
        y = window_reverse_cm(y, stripe_size, (H, W))
        if self.stripe_shift:
            y = jnp.roll(y, shift_size, axis=(1, 2))
        return y


class StripeAttention(nn.Module):
    """Plain (anchor-free) stripe attention — the ablation path used when
    anchor_window_down_factor == 1 (mixed_attn_block.py:405-509).  Direct QKV
    attention within each stripe; geometry entries are the df=1 tables/masks."""

    stripe_size_cfg: Tuple[Optional[int], Optional[int]]
    stripe_groups_cfg: Tuple[Optional[int], Optional[int]]
    stripe_shift: bool
    num_heads: int
    euclidean_dist: bool = False
    d_major: bool = False

    @nn.compact
    def __call__(self, qkv, table, index, mask):
        B, H, W, _ = qkv.shape
        stripe_size, shift_size = get_stripe_info(
            self.stripe_size_cfg, self.stripe_groups_cfg, self.stripe_shift, (H, W)
        )
        if self.stripe_shift:
            qkv = jnp.roll(qkv, (-shift_size[0], -shift_size[1]), axis=(1, 2))
        qkv = window_partition(qkv, stripe_size)
        q, k, v = _split_qkv_heads(qkv, self.num_heads, self.d_major)
        transform = AffineTransform(self.num_heads, name="attn_transform")
        x = cosine_attention(q, k, v, transform, table, index,
                             mask if self.stripe_shift else None,
                             self.euclidean_dist, d_major=self.d_major)
        x = _merge_heads(x, self.d_major)
        x = window_reverse(x, stripe_size, (H, W))
        if self.stripe_shift:
            x = jnp.roll(x, shift_size, axis=(1, 2))
        return x


class SeparableConv(nn.Module):
    """Depthwise + pointwise conv (mixed_attn_block.py:642-658)."""

    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = True
    act: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = (self.kernel_size, self.kernel_size)
        x = conv2d(x, in_ch, k, (self.strides, self.strides), self.use_bias,
                   groups=in_ch, name="depthwise", dtype=self.dtype)
        if self.act:
            x = gelu(x)
        return conv2d(x, self.features, (1, 1), use_bias=self.use_bias,
                      name="pointwise", dtype=self.dtype)


class _DenseParams(nn.Module):
    """Bare nn.Dense parameters (identical shapes/init/param paths) for code
    paths that consume the weights inside fused einsums instead of applying
    the layer — the attn_io="cm" boundary-fused attention."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_kernel_init,
                       (self.in_features, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class _QKVParams(nn.Module):
    """QKVProjection's parameters without application (path {name}/body/*)."""

    dim: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        return _DenseParams(self.dim * 3, self.in_features, self.use_bias,
                            name="body")()


def _qkv_cm(xw, wqkv, bqkv, dtype):
    """Channel-major qkv projection on partitioned windows.

    xw: (B, nW, C, N); wqkv: (C, 3Ch) slice -> (B, nW, 3Ch, N).  The dense's
    output channels land on a non-minor axis, so the subsequent [3, heads, d]
    head split is a free reshape (the legacy path pays a full-tensor
    swapaxes here — see _split_qkv_heads)."""
    dt = dtype or xw.dtype
    out = jnp.einsum("ck,bwcn->bwkn", wqkv.astype(dt), xw.astype(dt))
    if bqkv is not None:
        out = out + bqkv.astype(dt)[None, None, :, None]
    return out


# cm qkv projection form: "fused" computes one (B,nW,3C,N) tensor and
# slices; "split" runs three per-tensor contractions so the BACKWARD never
# materializes the 3C-wide grad concat (the copy the round-2 audit blamed
# for cm training's +5.5 GB backward — VERDICT r2 #6).
_QKV_CM_MODE = "fused"


def set_qkv_cm_mode(mode):
    assert mode in ("fused", "split"), mode
    global _QKV_CM_MODE
    _QKV_CM_MODE = mode


def _qkv_cm_heads(xw, wqkv, bqkv, dtype, h):
    """qkv projection + head split: (B, nW, C, N) -> 3 x (B, nW, h, d, N)."""
    if _QKV_CM_MODE == "fused":
        return _split_qkv_cm(_qkv_cm(xw, wqkv, bqkv, dtype), h)
    B, nW, C, N = xw.shape
    dt = dtype or xw.dtype
    Ch = wqkv.shape[1] // 3
    xc = xw.astype(dt)
    outs = []
    for i in range(3):
        o = jnp.einsum("ck,bwcn->bwkn",
                       wqkv[:, i * Ch:(i + 1) * Ch].astype(dt), xc)
        if bqkv is not None:
            o = o + bqkv[i * Ch:(i + 1) * Ch].astype(dt)[None, None, :, None]
        outs.append(o.reshape(B, nW, h, Ch // h, N))
    return tuple(outs)


class QKVProjection(nn.Module):
    """Shared QKV projection (mixed_attn_block.py:661-676)."""

    dim: int
    qkv_bias: bool = True
    proj_type: str = "linear"
    separable_conv_act: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.proj_type == "linear":
            return dense(x, self.dim * 3, use_bias=self.qkv_bias, name="body",
                         dtype=self.dtype)
        return SeparableConv(self.dim * 3, 3, 1, self.qkv_bias,
                             self.separable_conv_act, dtype=self.dtype,
                             name="body")(x)


class PatchMerging(nn.Module):
    """2×2 space-to-depth + linear reduction (mixed_attn_block.py:679-711)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        return dense(x, self.out_dim, use_bias=False, name="reduction")


class AnchorProjection(nn.Module):
    """Project features to the df×-downsampled anchor map at dim//2 channels
    (mixed_attn_block.py:714-785).  Deployed config uses avgpool + linear."""

    dim: int
    proj_type: str = "avgpool"
    one_stage: bool = True
    down_factor: int = 4
    separable_conv_act: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        df = self.down_factor
        out = self.dim // 2
        if self.one_stage:
            if self.proj_type in ("avgpool", "maxpool"):
                pool = nn.avg_pool if self.proj_type == "avgpool" else nn.max_pool
                x = pool(x, (df, df), strides=(df, df))
                return dense(x, out, name="reduction", dtype=self.dtype)
            if self.proj_type == "conv2d":
                k = df + 1
                return conv2d(x, out, (k, k), (df, df), name="body",
                              dtype=self.dtype)
            if self.proj_type == "separable_conv":
                return SeparableConv(out, df + 1, df, True,
                                     self.separable_conv_act,
                                     dtype=self.dtype, name="body")(x)
            if self.proj_type == "patchmerging":
                return PatchMerging(out, name="body")(x)
            raise ValueError(self.proj_type)
        for i in range(int(math.log2(df))):
            if self.proj_type == "conv2d":
                x = conv2d(x, out, (3, 3), (2, 2), name=f"body{i}")
            elif self.proj_type == "separable_conv":
                x = SeparableConv(out, 3, 2, True, self.separable_conv_act,
                                  name=f"body{i}")(x)
            elif self.proj_type == "patchmerging":
                x = PatchMerging(out, name=f"body{i}")(x)
            else:
                raise ValueError(self.proj_type)
        return x


class ChannelAttention(nn.Module):
    """RCAN squeeze-excite (mixed_attn_block.py:948-967)."""

    reduction: int = 16
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv2d(y, C // self.reduction, (1, 1), name="fc1", dtype=self.dtype)
        y = nn.relu(y)
        y = conv2d(y, C, (1, 1), name="fc2", dtype=self.dtype)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv-GELU-conv + channel attention local branch (mixed_attn_block.py:970-983)."""

    compress_ratio: int = 4
    reduction: int = 18
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # the C/4 compress stage lives channel-major: its C=45 (GRL-base)
        # NHWC form pads 128/45 = 2.8x under lane tiling and measured
        # ~21 GB of the 73 GB w32/df2 eval-tile traffic (10.7 GB of it a
        # pure layout-fix copy) — NCHW trailing dims are (H, W), unpadded.
        # Same params, same math; certified by the full-size GRL-base
        # golden test.
        y = ConvIO(C // self.compress_ratio, ("NHWC", "HWIO", "NCHW"),
                   dtype=self.dtype, name="cab0")(x)
        y = gelu(y)
        y = ConvIO(C, ("NCHW", "HWIO", "NHWC"), dtype=self.dtype,
                   name="cab2")(y)
        return ChannelAttention(self.reduction, dtype=self.dtype, name="ca")(y)


class MixedAttention(nn.Module):
    """Shared-QKV window + anchored-stripe attention
    (mixed_attn_block_efficient.py:282-397).

    The QKV output splits channel-wise: first half feeds window attention, second
    half stripe attention; outputs concatenate back before the output projection.
    """

    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: Size2
    window_shift: bool
    stripe_size_cfg: Tuple[Optional[int], Optional[int]]
    stripe_groups_cfg: Tuple[Optional[int], Optional[int]]
    stripe_shift: bool
    qkv_bias: bool = True
    qkv_proj_type: str = "linear"
    anchor_proj_type: str = "avgpool"
    anchor_one_stage: bool = True
    anchor_window_down_factor: int = 1
    separable_conv_act: bool = True
    euclidean_dist: bool = False
    # ablation switches (mixed_attn_block.py:846-891): stripe half as a second
    # window attention / square stripes; anchor is dropped when df == 1 like the
    # ablation MixedAttention (mixed_attn_block.py:826-838)
    double_window: bool = False
    stripe_square: bool = False
    use_pallas: bool = False
    d_major: bool = False
    attn_io: str = "legacy"  # "legacy" | "cm" boundary-fused (linear qkv only)
    out_proj_type: str = "linear"  # "linear" | "conv2d" (3x3; ablation-only)
    dtype: object = None

    @nn.compact
    def __call__(self, x, tim):
        # x: (B, H, W, C); tim: per-block table/index/mask dict
        use_anchor = self.anchor_window_down_factor > 1
        # the boundary-fused path needs the raw projection weights; separable
        # conv qkv and the ablation branches keep the legacy flow.  v3 rides
        # the same raw-weight plumbing (the kernel does the qkv projection
        # itself), so it implies cm io.
        fused_io = ((self.attn_io == "cm" or self.use_pallas == "v3")
                    and self.qkv_proj_type == "linear"
                    and not self.double_window and use_anchor
                    and not self.euclidean_dist)
        # v3 degrades to the plain XLA cm path when its preconditions fail
        use_pallas = self.use_pallas
        if use_pallas == "v3" and not fused_io:
            use_pallas = False
        if fused_io:
            C = x.shape[-1]
            wqkv, bqkv = _QKVParams(self.dim, C, self.qkv_bias, name="qkv")()
            half = 3 * self.dim // 2
            w_win, w_str = wqkv[:, :half], wqkv[:, half:]
            b_win = bqkv[:half] if bqkv is not None else None
            b_str = bqkv[half:] if bqkv is not None else None
            qkv_window = qkv_stripe = x
        else:
            w_win = w_str = b_win = b_str = None
            qkv = QKVProjection(self.dim, self.qkv_bias, self.qkv_proj_type,
                                self.separable_conv_act, dtype=self.dtype,
                                name="qkv")(x)
            qkv_window, qkv_stripe = jnp.split(qkv, 2, axis=-1)

        # use_pallas: False | True (both halves) | "window" | "stripe" | "v3"
        # (one half only — per-half engine choice: the whole-window v2
        # kernel loses at small windows while the flash stripe path is at
        # parity at large geometries, so mixed modes are useful; "v3" runs
        # the whole-block-half kernels on both halves)
        up_win = "v3" if use_pallas == "v3" else use_pallas in (True, "window")
        up_str = "v3" if use_pallas == "v3" else use_pallas in (True, "stripe")
        x_window = WindowAttention(
            self.window_size, self.num_heads_w, self.window_shift,
            self.euclidean_dist, up_win,
            self.d_major,
            dtype=self.dtype, name="window_attn",
        )(qkv_window, tim["table_w"], tim["index_w"], tim["mask_w"],
          tim.get("bands_w"), w_win, b_win, tim.get("fac_w"))

        if self.double_window:
            x_stripe = WindowAttention(
                self.window_size, self.num_heads_w, self.window_shift,
                self.euclidean_dist, d_major=self.d_major, name="stripe_attn",
            )(qkv_stripe, tim["table_w"], tim["index_w"], tim["mask_w"],
              tim.get("bands_w"))
        elif use_anchor:
            anchor = AnchorProjection(self.dim, self.anchor_proj_type,
                                      self.anchor_one_stage,
                                      self.anchor_window_down_factor,
                                      self.separable_conv_act, dtype=self.dtype,
                                      name="anchor")(x)
            x_stripe = AnchorStripeAttention(
                self.stripe_size_cfg, self.stripe_groups_cfg, self.stripe_shift,
                self.num_heads_s, self.anchor_window_down_factor,
                self.euclidean_dist, up_str,
                self.d_major,
                dtype=self.dtype, name="stripe_attn",
            )(qkv_stripe, anchor, tim["table_s"], tim["index_a2w"],
              tim["index_w2a"], tim["mask_a2w"], tim["mask_w2a"],
              w_str, b_str, tim.get("bands_s"), tim.get("bands_s_a"),
              tim.get("fac_a2w"), tim.get("fac_w2a"))
        else:
            ssize = (tuple(self.window_size) if self.stripe_square
                     else self.stripe_size_cfg)
            sgroups = ((None, None) if self.stripe_square
                       else self.stripe_groups_cfg)
            x_stripe = StripeAttention(
                ssize, sgroups, self.stripe_shift, self.num_heads_s,
                self.euclidean_dist, self.d_major, name="stripe_attn",
            )(qkv_stripe, tim["table_s"], tim["index_w2a"], tim["mask_w2a"])

        x = jnp.concatenate([x_window, x_stripe], axis=-1)
        # out_proj_type=conv2d (mixed_attn_block.py:892-895,923-928): a 3x3
        # conv output projection — dead in the reference's shipped configs
        # (only the unreferenced ablation GRL could set it), kept for parity
        if self.out_proj_type == "conv2d":
            return conv2d(x, self.dim, name="proj", dtype=self.dtype)
        return dense(x, self.dim, name="proj", dtype=self.dtype)


class EfficientMixAttnTransformerBlock(nn.Module):
    """GRL transformer block: mixed attention + optional CAB + MLP, post-norm
    residuals with res_scale (mixed_attn_block_efficient.py:406-556)."""

    dim: int
    num_heads_w: int
    num_heads_s: int
    window_size: Size2
    window_shift: bool
    stripe_size_cfg: Tuple[Optional[int], Optional[int]]
    stripe_groups_cfg: Tuple[Optional[int], Optional[int]]
    stripe_type: str  # "H" or "W"
    stripe_shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qkv_proj_type: str = "linear"
    anchor_proj_type: str = "avgpool"
    anchor_one_stage: bool = True
    anchor_window_down_factor: int = 1
    drop_path_rate: float = 0.0
    res_scale: float = 1.0
    local_connection: bool = False
    separable_conv_act: bool = True
    euclidean_dist: bool = False
    double_window: bool = False
    stripe_square: bool = False
    use_pallas: bool = False
    d_major: bool = False
    attn_io: str = "legacy"
    out_proj_type: str = "linear"
    # static attribute (not a call arg) so nn.remat needs no static_argnums
    deterministic: bool = True
    dtype: object = None

    def _select_tim(self, g):
        """Pick this block's slice of the shared geometry dict (efficient block
        _get_table_index_mask, mixed_attn_block_efficient.py:510-537)."""
        s = "sv" if self.stripe_type == "W" else "sh"
        return {
            "table_w": g["table_w"],
            "index_w": g["index_w"],
            "mask_w": g["mask_w"],
            "bands_w": g.get("bands_w"),
            "table_s": g[f"table_{s}"],
            "index_a2w": g[f"index_{s}_a2w"],
            "index_w2a": g[f"index_{s}_w2a"],
            "mask_a2w": g[f"mask_{s}_a2w"],
            "mask_w2a": g[f"mask_{s}_w2a"],
            "bands_s": g.get(f"bands_{s}"),
            "bands_s_a": g.get(f"bands_{s}_a"),
            # one-hot bias factors (None when absent, e.g. hand-built
            # geometry dicts in unit tests -> gather fallback)
            "fac_w": (g["bfac_w_y"], g["bfac_w_x"])
                     if "bfac_w_y" in g else None,
            "fac_a2w": (g[f"bfac_{s}_a2w_y"], g[f"bfac_{s}_a2w_x"])
                       if f"bfac_{s}_a2w_y" in g else None,
            "fac_w2a": (g[f"bfac_{s}_w2a_y"], g[f"bfac_{s}_w2a_x"])
                       if f"bfac_{s}_w2a_y" in g else None,
        }

    @nn.compact
    def __call__(self, x, geometry):
        deterministic = self.deterministic
        tim = self._select_tim(geometry)
        if self.stripe_type == "W":
            ssize = self.stripe_size_cfg[::-1]
            sgroups = self.stripe_groups_cfg[::-1]
        else:
            ssize = self.stripe_size_cfg
            sgroups = self.stripe_groups_cfg

        attn = MixedAttention(
            self.dim, self.num_heads_w, self.num_heads_s, self.window_size,
            self.window_shift, ssize, sgroups, self.stripe_shift, self.qkv_bias,
            self.qkv_proj_type, self.anchor_proj_type, self.anchor_one_stage,
            self.anchor_window_down_factor, self.separable_conv_act,
            self.euclidean_dist, self.double_window, self.stripe_square,
            self.use_pallas, self.d_major, self.attn_io,
            out_proj_type=self.out_proj_type, dtype=self.dtype,
            name="attn",
        )

        def dp(y):
            rng = self.make_rng("droppath") if (
                not deterministic and self.drop_path_rate > 0.0) else None
            return drop_path(y, self.drop_path_rate, deterministic, rng)

        branch = self.res_scale * dp(layer_norm(attn(x, tim), name="norm1"))
        if self.local_connection:
            branch = branch + CAB(dtype=self.dtype, name="conv")(x)
        x = x + branch
        x = x + self.res_scale * dp(
            layer_norm(Mlp(int(self.dim * self.mlp_ratio), self.dim,
                           dtype=self.dtype, name="mlp")(x),
                       name="norm2"))
        return x

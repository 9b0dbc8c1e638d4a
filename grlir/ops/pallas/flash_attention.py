"""Flash-style fused attention for LARGE window/stripe geometries (Pallas TPU).

GRL-base evaluates with window 32 / stripes 64x64 (scripts/grl/grl_test.md:46):
1024-4096 tokens per window.  At those shapes the XLA lowering materializes
(nW, h, N1, N2) attention matrices in HBM — 0.4 GB per matrix pass at 256² —
which dominates per-tile latency.  This kernel keeps each (query-tile, key-set)
attention submatrix in VMEM: cosine-normalize -> QK^T -> *scale + CPB bias
(+band shift mask) -> fp32 softmax -> AV, one query tile at a time, one head at
a time (peak VMEM is a single (q_tile, N2) fp32 matrix).

Contrast with ops/pallas/attention.py (v2): that kernel targets SMALL windows
(N <= ~128) where whole windows fit VMEM; this one tiles the query axis and
streams bias tiles, so N1/N2 in the thousands work.  Inputs/outputs are
channel-major per the attn_io="cm" boundary (no transposes at the call edge).

Grid order is (q_tile, window): consecutive steps share the same bias tile
(fetched once per q_tile) while k/v blocks re-fetch per window — bias tiles
are the larger operand at these shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, scale_ref, bias_ref, *rest,
                  num_heads: int, has_bands: bool):
    if has_bands:
        bq_ref, bk_ref, out_ref = rest
    else:
        (out_ref,) = rest
    # q: (1, h*d, T1); k, v: (1, h*d, N2); bias: (h, T1, N2) bf16;
    # scale: (h, 1) f32; bands: (1, T1) / (1, N2) int32
    h = num_heads
    Ch, T1 = q_ref.shape[1], q_ref.shape[2]
    N2 = k_ref.shape[2]
    d = Ch // h

    q = q_ref[0].reshape(h, d, T1)
    k = k_ref[0].reshape(h, d, N2)
    v = v_ref[0].reshape(h, d, N2)

    if has_bands:
        neq = bq_ref[0, 0][:, None] != bk_ref[0, 0][None, :]  # (T1, N2)
        mask = jnp.where(neq, -100.0, 0.0)

    # MXU operands stay in the input dtype (fp32 accumulation is implicit):
    # cosine-normalized q/k are in [-1,1] so bf16 operands lose nothing, and
    # bf16 MXU rate is 4x fp32 — the d=30-contraction QK^T is util-bound
    # enough without also paying the fp32 rate.  Heads ride as a dot_general
    # batch dim: one MXU issue for all heads instead of h serialized
    # d=30-deep matmuls.
    mxu_dt = q_ref.dtype
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = qf * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(qf * qf, 1, keepdims=True), 1e-24))
    kn = kf * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(kf * kf, 1, keepdims=True), 1e-24))
    attn = jax.lax.dot_general(
        qn.astype(mxu_dt), kn.astype(mxu_dt),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, T1, N2) fp32
    attn = attn * scale_ref[...][:, :, None] + bias_ref[...].astype(jnp.float32)
    if has_bands:
        attn = attn + mask[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        v, attn.astype(mxu_dt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, d, T1) fp32
    out_ref[0] = out.reshape(h * d, T1).astype(out_ref.dtype)


def flash_rect_attention(
    q, k, v, logit_scale, bias,
    bands_q: Optional[jnp.ndarray] = None,
    bands_k: Optional[jnp.ndarray] = None,
    q_tile: int = 128,
    interpret: Optional[bool] = None,
):
    """Tiled fused cosine attention over channel-major window blocks.

    q: (B, nW, h, d, N1); k, v: (B, nW, h, d, N2)  [channel-major, d-major]
    logit_scale: raw (h, 1, 1) parameter (clamped+exp here);
    bias: (h, N1, N2) continuous position bias (any float dtype);
    bands_q/bands_k: optional (nW, N1)/(nW, N2) int32 shift-band ids -> the
    additive {0,-100} mask is built in-kernel (calculate_mask semantics).
    Returns (B, nW, h, d, N1).
    """
    import math

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, nW, h, d, N1 = q.shape
    N2 = k.shape[4]
    W = B * nW
    Ch = h * d

    qf = q.reshape(W, Ch, N1)
    kf = k.reshape(W, Ch, N2)
    vf = v.reshape(W, Ch, N2)

    T1 = min(q_tile, N1)
    while N1 % T1:
        T1 //= 2
    grid = (N1 // T1, W)

    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0))).reshape(h, 1)
    # stream bias tiles at the compute precision (bf16 halves the dominant
    # bias read; fp32 models keep full precision)
    bias = bias.astype(jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32)

    in_specs = [
        pl.BlockSpec((1, Ch, T1), lambda t, w: (w, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ch, N2), lambda t, w: (w, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ch, N2), lambda t, w: (w, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda t, w: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, T1, N2), lambda t, w: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf, scale, bias]
    # bands must come as a pair: keying on bands_q alone would silently drop
    # the shift mask for (None, bands_k) and crash on (bands_q, None)
    assert (bands_q is None) == (bands_k is None), (bands_q, bands_k)
    has_bands = bands_q is not None
    if has_bands:
        # 3D (W, 1, N) so the trailing-two block dims satisfy Mosaic's
        # (8, 128)-divisible-or-full constraint
        bq = jnp.broadcast_to(bands_q[None], (B, nW, N1)).reshape(W, 1, N1)
        bk = jnp.broadcast_to(bands_k[None], (B, nW, N2)).reshape(W, 1, N2)
        in_specs.append(pl.BlockSpec((1, 1, T1), lambda t, w: (w, 0, t),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, N2), lambda t, w: (w, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += [bq.astype(jnp.int32), bk.astype(jnp.int32)]

    kernel = functools.partial(_flash_kernel, num_heads=h,
                               has_bands=has_bands)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Ch, T1), lambda t, w: (w, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, Ch, N1), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * h * N1 * N2 * d * 2,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=W * h * N1 * N2,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(B, nW, h, d, N1)

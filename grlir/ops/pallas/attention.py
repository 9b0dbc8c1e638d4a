"""Fused cosine-similarity window/stripe attention (Pallas TPU kernel).

The XLA path materializes every attention matrix in HBM (QK^T write, bias+mask+
softmax read/write, AV read) — for GRL at 256px that's the dominant memory
traffic on a bandwidth-bound model.  This kernel keeps the whole chain
  L2-normalize -> QK^T -> *logit_scale + CPB-bias (+shift mask) -> softmax -> AV
in VMEM, grid-stepping over blocks of windows.  Window token counts in GRL are
tiny (64 for 8x8 windows, ~512 for stripes), so no online-softmax tiling is
needed — a whole (N1, N2) attention matrix per window-head fits comfortably.

Used for both attention patterns (SURVEY.md §7 Pallas kernels #1/#2):
  - square window attention: N1 == N2 == wh*ww
  - anchored stripe attention: called twice (anchor->window then window->anchor)

Forward-only (inference path); training uses the XLA lowering.  Gated by
GRLConfig.use_pallas_attention and auto-disabled off-TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, scale_ref, bias_ref,
                      *mask_and_out, has_mask: bool, windows_per_mask: int):
    # ref order: inputs..., then outputs — mask (if any) precedes out_ref
    if has_mask:
        mask_ref, out_ref = mask_and_out
    else:
        (out_ref,) = mask_and_out
    # q: (G, h, N1, d); k, v: (G, h, N2, d); bias: (h, N1, N2); scale: (h, 1)
    G, h, N1, d = q_ref.shape
    N2 = k_ref.shape[2]
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
    kn = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))

    # tpu.matmul supports a single batch dim -> fold (G, h) together
    qn = qn.reshape(G * h, N1, d)
    kn = kn.reshape(G * h, N2, d)
    attn = jax.lax.dot_general(
        qn, kn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, N1, N2)

    scale = scale_ref[...].reshape(1, -1, 1, 1)
    attn = attn * scale + bias_ref[...][None]

    if has_mask:
        # mask block (G, N1, N2), pre-expanded across batch outside the kernel
        attn = attn + mask_ref[...][:, None]

    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.reshape(G * h, N1, N2), v.reshape(G * h, N2, d),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, N1, d)
    out_ref[...] = out.astype(out_ref.dtype)


def _auto_block_windows(W, h, N1, N2, d, budget_bytes=4 * 1024 * 1024):
    """Largest divisor of W whose per-block VMEM footprint fits the budget.

    The kernel casts q/k/v to fp32 and holds the full (N1, N2) attention
    matrix per window-head; scoped VMEM on v5e is 16MB and Mosaic's stack
    accounting adds input/output double-buffering on top of this estimate,
    so stay well under (a 6MB budget measured 16.1M/16M stack OOM on the
    512-token stripe shapes of the attn_io="cm" path).
    """
    per_window = 4 * h * (2 * N1 * d + 2 * N2 * d + 3 * N1 * N2)
    g = max(1, min(W, budget_bytes // max(per_window, 1)))
    while W % g:
        g -= 1
    return g


def fused_cosine_attention(q, k, v, logit_scale, bias,
                           mask: Optional[jnp.ndarray] = None,
                           block_windows: Optional[int] = None,
                           interpret: Optional[bool] = None):
    """q: (B, nW, h, N1, d); k, v: (B, nW, h, N2, d);
    logit_scale: (h, 1, 1) raw parameter (clamped+exp inside);
    bias: (h, N1, N2) fp32 (already 16*sigmoid(cpb));
    mask: (nW, N1, N2) or None.  Returns (B, nW, h, N1, d).
    """
    if interpret is None:
        # Mosaic kernels only compile for TPU; fall back to the interpreter on
        # CPU (tests / virtual meshes) so the flag is usable everywhere
        interpret = jax.default_backend() != "tpu"
    B, nW, h, N1, d = q.shape
    N2 = k.shape[3]
    W = B * nW
    qf = q.reshape(W, h, N1, d)
    kf = k.reshape(W, h, N2, d)
    vf = v.reshape(W, h, N2, d)

    if block_windows is None:
        block_windows = _auto_block_windows(W, h, N1, N2, d)
    G = math.gcd(W, block_windows) if W % block_windows else block_windows
    grid = (W // G,)

    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0))).reshape(h, 1)

    in_specs = [
        pl.BlockSpec((G, h, N1, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, h, N2, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, h, N2, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, N1, N2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf, scale, bias.astype(jnp.float32)]
    has_mask = mask is not None
    if has_mask:
        # expand per-window masks across batch once (small: nW*N1*N2)
        mask_full = jnp.broadcast_to(mask[None], (B, nW, N1, N2)).reshape(
            W, N1, N2)
        in_specs.append(
            pl.BlockSpec((G, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask_full.astype(jnp.float32))

    kernel = functools.partial(_attention_kernel, has_mask=has_mask,
                               windows_per_mask=nW)
    flops = 2 * W * h * N1 * N2 * d * 2
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, h, N1, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, h, N1, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=W * h * N1 * N2,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(B, nW, h, N1, d)


def _qkv_attention_kernel(qkv_ref, scale_ref, bias_ref, *rest,
                          has_mask: bool, num_heads: int):
    """v2 kernel: consumes the window-partitioned qkv block (G, N, 3C)
    directly and writes (G, N, C).  The per-head split, both matmuls, the
    bias/mask/softmax chain, and the head merge all stay in VMEM — the
    (B, nW, h, N, d) operands and (nW, h, N, N) attention matrices of the
    XLA lowering never reach HBM (they are the largest byte consumers of
    the whole-model roofline; see NEXT.md).

    Shift masks arrive factorized as per-window band ids (G, N) int32 and
    are compared in-kernel (same semantics as geometry.calculate_mask).
    """
    if has_mask:
        bands_ref, out_ref = rest
    else:
        (out_ref,) = rest
    # qkv block is channel-major (G, 3C, N): the head split then only touches
    # non-minor dims (Mosaic cannot shape-cast the minor/lane dimension)
    G, C3, N = qkv_ref.shape
    C = C3 // 3
    h = num_heads
    d = C // h

    x = qkv_ref[...].astype(jnp.float32)  # (G, 3C, N)
    x = x.reshape(G, 3, h, d, N)  # channel order [3, h, d]
    q = x[:, 0].reshape(G * h, d, N)
    k = x[:, 1].reshape(G * h, d, N)
    v = x[:, 2].reshape(G * h, d, N)

    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, 1, keepdims=True), 1e-24))
    kn = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, 1, keepdims=True), 1e-24))

    # attn[n, m] = sum_d qn[d, n] * kn[d, m]
    attn = jax.lax.dot_general(
        qn, kn,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, N, N)

    attn = attn * scale_ref[...].reshape(1, -1, 1, 1) + bias_ref[...][None]
    if has_mask:
        b = bands_ref[...]  # (G, N) int32
        neq = b[:, None, :] != b[:, :, None]  # (G, N, N)
        attn = attn + jnp.where(neq, -100.0, 0.0)[:, None]

    attn = jax.nn.softmax(attn, axis=-1)
    # out[d, n] = sum_m v[d, m] * attn[n, m]
    out = jax.lax.dot_general(
        v, attn.reshape(G * h, N, N),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, C, N)
    out_ref[...] = out.astype(out_ref.dtype)


def fused_window_attention_qkv(qkv, logit_scale, bias, num_heads: int,
                               bands=None, block_windows: Optional[int] = None,
                               interpret: Optional[bool] = None,
                               channel_major: bool = False):
    """Fused window attention from partitioned qkv.

    qkv: (B, nW, N, 3C) — or (B, nW, 3C, N) with channel_major=True (the
    attn_io="cm" path produces this layout directly, so no boundary swap is
    paid at all); bias: (h, N, N) fp32; logit_scale raw (h, 1, 1);
    bands: optional (nW, N) int32 shift-mask band ids (geometry
    build_geometry_compact) -> additive {0,-100} mask built in-kernel.
    Returns (B, nW, N, C) — (B, nW, C, N) when channel_major.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if channel_major:
        B, nW, C3, N = qkv.shape
    else:
        B, nW, N, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    W = B * nW
    # channel-major so the in-kernel head split never touches the lane dim;
    # minor N >= 64 also halves the padded HBM footprint vs d=32-minor
    if channel_major:
        qf = qkv.reshape(W, C3, N)
    else:
        qf = jnp.swapaxes(qkv.reshape(W, N, C3), 1, 2)  # (W, 3C, N)

    if block_windows is None:
        # fp32 in-kernel footprint: qkv + q/k/v splits + attn + out
        per_window = 4 * (2 * N * C3 + 3 * h * N * N + N * C)
        g = max(1, min(W, (6 * 1024 * 1024) // max(per_window, 1)))
        while W % g:
            g -= 1
        block_windows = g
    G = block_windows
    grid = (W // G,)

    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0))).reshape(h, 1)

    in_specs = [
        pl.BlockSpec((G, C3, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qf, scale, bias.astype(jnp.float32)]
    has_mask = bands is not None
    if has_mask:
        bands_full = jnp.broadcast_to(bands[None], (B, nW, N)).reshape(W, N)
        in_specs.append(
            pl.BlockSpec((G, N), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(bands_full.astype(jnp.int32))

    kernel = functools.partial(_qkv_attention_kernel, has_mask=has_mask,
                               num_heads=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, C, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, C, N), qkv.dtype),
        interpret=interpret,
    )(*args)
    if channel_major:
        return out.reshape(B, nW, C, N)
    return jnp.swapaxes(out, 1, 2).reshape(B, nW, N, C)


def fused_cosine_attention_auto(q, k, v, logit_scale, bias,
                                mask: Optional[jnp.ndarray] = None,
                                interpret: Optional[bool] = None):
    """Dispatch to the best fused kernel for the shape.

    Square small windows (N1 == N2 <= 128, e.g. 8x8 windows -> 64 tokens) go
    through the block-diagonal packed kernel: P windows share one
    (P*N, P*N) attention so the MXU runs full-width tiles instead of P
    serialized 64-wide matmuls (measured 0.14 ms vs 0.24 ms unpacked vs
    0.31 ms XLA per GRL-S window-attention layer at 256²).  Skinny stripe
    shapes (a2w / w2a) use the unpacked kernel.
    """
    B, nW, h, N1, d = q.shape
    N2 = k.shape[3]
    if N1 == N2 and N1 <= 128:
        pack = math.gcd(B * nW, 4)
        if pack > 1:
            return fused_cosine_attention_packed(
                q, k, v, logit_scale, bias, mask, pack=pack,
                interpret=interpret)
    return fused_cosine_attention(q, k, v, logit_scale, bias, mask,
                                  interpret=interpret)


def _packed_attention_kernel(q_ref, k_ref, v_ref, scale_ref, bias_ref,
                             bdmask_ref, *mask_and_out, has_mask: bool,
                             pack: int, n1: int, n2: int):
    """Block-diagonal packed variant: P windows fused into one (P*N1, P*N2)
    attention so the MXU runs full-width tiles instead of P small matmuls.

    Off-diagonal logits get -1e9 before softmax (exp -> 0), which makes the
    result exactly the per-window attention at P x FLOP cost — a good trade on
    a memory-bound model where the MXU is otherwise latency-starved.
    """
    if has_mask:
        mask_ref, out_ref = mask_and_out
    else:
        (out_ref,) = mask_and_out
    G, h, PN1, d = q_ref.shape
    PN2 = k_ref.shape[2]
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    qn = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
    kn = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))

    attn = jax.lax.dot_general(
        qn.reshape(G * h, PN1, d), kn.reshape(G * h, PN2, d),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, PN1, PN2)

    scale = scale_ref[...].reshape(1, -1, 1, 1)
    # bias tiled PxP outside; off-diagonal values are masked away below
    attn = attn * scale + bias_ref[...][None] + bdmask_ref[...][None, None]

    if has_mask:
        # per-window shift masks live on the diagonal blocks only; build the
        # block-diagonal additive mask with static concats (Mosaic has no
        # scatter lowering, so no .at[].set here)
        m = mask_ref[...]  # (G, pack, n1, n2)
        zero = jnp.zeros_like(m[:, 0])
        rows = [
            jnp.concatenate(
                [m[:, i] if i == j else zero for j in range(pack)], axis=-1)
            for i in range(pack)
        ]
        attn = attn + jnp.concatenate(rows, axis=-2)[:, None]

    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.reshape(G * h, PN1, PN2), v.reshape(G * h, PN2, d),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, h, PN1, d)
    out_ref[...] = out.astype(out_ref.dtype)


def fused_cosine_attention_packed(q, k, v, logit_scale, bias,
                                  mask: Optional[jnp.ndarray] = None,
                                  pack: int = 4,
                                  groups_per_block: Optional[int] = None,
                                  interpret: Optional[bool] = None):
    """Block-diagonal packed fused attention.  Same contract as
    fused_cosine_attention; `pack` windows share one attention matrix."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, nW, h, N1, d = q.shape
    N2 = k.shape[3]
    W = B * nW
    if W % pack:
        pack = math.gcd(W, pack)
    WP = W // pack

    # windows are contiguous in W: group P neighbours, concat their tokens
    qf = q.reshape(WP, pack, h, N1, d).transpose(0, 2, 1, 3, 4).reshape(
        WP, h, pack * N1, d)
    kf = k.reshape(WP, pack, h, N2, d).transpose(0, 2, 1, 3, 4).reshape(
        WP, h, pack * N2, d)
    vf = v.reshape(WP, pack, h, N2, d).transpose(0, 2, 1, 3, 4).reshape(
        WP, h, pack * N2, d)

    if groups_per_block is None:
        groups_per_block = _auto_block_windows(WP, h, pack * N1, pack * N2, d)
    G = math.gcd(WP, groups_per_block) if WP % groups_per_block else groups_per_block
    grid = (WP // G,)

    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0))).reshape(h, 1)
    bias_t = jnp.tile(bias.astype(jnp.float32), (1, pack, pack))
    bd = np.full((pack * N1, pack * N2), -1e9, np.float32)
    for i in range(pack):
        bd[i * N1:(i + 1) * N1, i * N2:(i + 1) * N2] = 0.0
    bd = jnp.asarray(bd)

    in_specs = [
        pl.BlockSpec((G, h, pack * N1, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, h, pack * N2, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, h, pack * N2, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, pack * N1, pack * N2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pack * N1, pack * N2), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf, scale, bias_t, bd]
    has_mask = mask is not None
    if has_mask:
        mask_full = jnp.broadcast_to(mask[None], (B, nW, N1, N2)).reshape(
            WP, pack, N1, N2).astype(jnp.float32)
        in_specs.append(
            pl.BlockSpec((G, pack, N1, N2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask_full)

    kernel = functools.partial(_packed_attention_kernel, has_mask=has_mask,
                               pack=pack, n1=N1, n2=N2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, h, pack * N1, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((WP, h, pack * N1, d), q.dtype),
        interpret=interpret,
    )(*args)
    out = out.reshape(WP, h, pack, N1, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, nW, h, N1, d)

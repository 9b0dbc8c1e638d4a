"""Pallas v3: whole-block-half fused attention (docs/PALLAS_V3_DESIGN.md).

Round-2 evidence says per-op kernels lose at the custom-call boundary (v1/v2:
1.37 vs 1.60 MP/s whole-model; mixed per-half engines lose too) — the kernel
must subsume the boundaries.  These kernels ingest the block input x in plain
NHWC straight from HBM and emit the attention-half output in NHWC: the
BlockSpec index map IS the window partition, so the partition/reverse copies,
the qkv HBM round-trip, and every attention operand disappear from the
program — only x (read) and y (write) touch HBM.

Key deviations from the original v3 sketch that make this Mosaic-clean:

- Tokens stay in RASTER order end-to-end.  A grid block (wh, P*ww, C)
  free-reshapes to (P*N, C) tokens (both merged dims are non-minor); the
  window structure moves into the BIAS: the packed (h, P*N, P*N) constant is
  permuted raster<->window OUTSIDE the kernel with two one-hot matmuls and
  carries the -1e9 block-diagonal separation.  No in-kernel relayouts, no
  window_reverse — the output block writes back raster.
- qkv is computed transposed by contraction order (w (C,3Cw) x tokens
  (PN, C) -> (3Cw, PN)), so head splits only touch sublane dims (Mosaic
  cannot shape-cast the lane dim).
- Shift masks use per-token band ids compared in-kernel (proven in the v2
  kernel); the cyclic roll itself stays outside (one XLA copy per shifted
  block — the "pre-roll once per block pair" option of the design).
- The output projection deliberately stays OUTSIDE (XLA): proj needs the
  concat of both halves, and XLA fuses the concat into the proj matmul, so
  partial per-half projections would cost MORE traffic (2x dim-wide partials
  vs 2 half-wide y tensors).

Matmul operands are bf16 (fp32 accumulate via preferred_element_type) to
match the XLA path's numerics and MXU rate; normalize/softmax run fp32.

Reference hot loop being replaced:
/root/reference/models/common/mixed_attn_block_efficient.py:128-270.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Size2 = Tuple[int, int]


def _interpret_default():
    # Mosaic compiles only on TPU; interpret elsewhere (CPU tests/meshes)
    return jax.default_backend() != "tpu"


def _auto_pack_w(W: int, window: Size2) -> int:
    """Windows packed per attention: >=128 lanes for full MXU tiles, never
    beyond the row of windows (same rule as the v2 packed kernel)."""
    wh, ww = window
    pack_w = max(1, min(W // ww, -(-128 // (wh * ww)) * 2))
    while (W // ww) % pack_w:
        pack_w -= 1
    return pack_w


# VMEM spent on the packed (h, PN, PN) fp32 bias constant; beyond this the
# whole-half kernel can't hold its operands and the XLA path wins anyway
# (large-N geometries like GRL-base w32 have matmul-bias XLA at parity).
_BIAS_VMEM_BUDGET = 4 * 1024 * 1024


# Large-window path (N >= _LARGE_N): pack_w=1 (the window alone fills the
# lanes), bias resident in bf16, attention q-row-tiled so the (h, PN, PN)
# fp32 matrix never exists.  Covers GRL-base w32 (N=1024, bias 6.3 MB bf16).
_LARGE_N = 512
_LARGE_BIAS_BUDGET = 8 * 1024 * 1024


def _bias_bytes(PN: int, num_heads: int) -> int:
    itemsize = 2 if PN > _LARGE_N else 4
    return num_heads * PN * PN * itemsize


def window_half_supported(x_size: Size2, window: Size2, num_heads: int) -> bool:
    """Static guard: can fused_window_half hold this geometry in VMEM?"""
    H, W = x_size
    wh, ww = window
    if H % wh or W % ww:
        return False
    N = wh * ww
    if N > _LARGE_N:
        return _bias_bytes(N, num_heads) <= _LARGE_BIAS_BUDGET
    PN = _auto_pack_w(W, window) * N
    return num_heads * PN * PN * 4 <= _BIAS_VMEM_BUDGET


def _stripe_resident_supported(stripe: Size2, df: int, num_heads: int) -> bool:
    sh, sw = stripe
    N1 = sh * sw
    N2 = (sh // df) * (sw // df)
    return 2 * num_heads * N2 * N1 * 4 <= _BIAS_VMEM_BUDGET


# Large-stripe path (GRL-base w32/df2 tiles: stripe 64x64, N1=4096, biases
# ~50 MB each — nothing resident): two kernels that STREAM the bias in bf16
# tiles along the axis the softmax does NOT reduce over, so no online
# softmax is ever needed:
#   a2w: grid walks N2 (anchor) tiles — softmax over N1 has full rows;
#   w2a: grid walks N1 (token row-band) tiles — softmax over N2 has full
#        columns.
# Per-stripe k/v (a2w) and anchor (w2a) projections are computed once at
# tile 0 into VMEM scratch; P stripes pack per grid step so each streamed
# bias tile is reused P times.
_STRIPE_ATTN_BUDGET = 4 * 1024 * 1024  # fp32 attention tile per step


def _stripe_large_tiles(stripe: Size2, df: int, num_heads: int):
    """(n2_tile, n1_tile) for the streamed-bias path, or None."""
    sh, sw = stripe
    N1 = sh * sw
    N2 = (sh // df) * (sw // df)
    n2t = min(N2, max(8, _STRIPE_ATTN_BUDGET // (4 * num_heads * N1)
                      // 8 * 8))
    while n2t >= 8 and N2 % n2t:
        n2t -= 8
    if n2t < 8 or num_heads * n2t * N1 * 4 > _STRIPE_ATTN_BUDGET:
        return None
    # n1t is a LANE (last) block dim of the streamed w2a bias/band tiles, so
    # Mosaic requires it % 128 (or the full N1)
    rows = max(1, _STRIPE_ATTN_BUDGET // (4 * num_heads * N2) // sw)
    n1t = min(N1, rows * sw)
    while n1t >= sw and (N1 % n1t or not (n1t % 128 == 0 or n1t == N1)):
        n1t -= sw
    if n1t < sw or num_heads * N2 * n1t * 4 > _STRIPE_ATTN_BUDGET:
        return None
    return n2t, n1t


def stripe_half_supported(x_size: Size2, stripe: Size2, df: int,
                          num_heads: int) -> bool:
    """Static guard for fused_stripe_half: resident-bias kernel (small
    geometries) or streamed-bias large path (GRL-base tiles)."""
    H, W = x_size
    sh, sw = stripe
    if H % sh or W % sw or sh % df or sw % df:
        return False
    if _stripe_resident_supported(stripe, df, num_heads):
        return True
    return _stripe_large_tiles(stripe, df, num_heads) is not None


def pack_window_bias(bias, window: Size2, pack_w: int, out_dtype=jnp.float32):
    """(h, N, N) per-window bias -> (h, P*N, P*N) packed bias in RASTER order.

    The kernel's token n indexes the (wh, P*ww) block row-major:
    n = r * (P*ww) + c, belonging to window c//ww, in-window token
    r*ww + c%ww.  Built with one-hot matmuls (exact selection, no gather).
    Off-diagonal (cross-window) entries get -1e9 so the packed softmax
    factorizes into the per-window softmaxes exactly.
    """
    h, N, _ = bias.shape
    wh, ww = window
    P = pack_w
    if P == 1:
        # unpacked: raster order IS window token order — identity permutation
        return bias.astype(out_dtype)
    PN = P * N
    n = np.arange(PN)
    r, c = n // (P * ww), n % (P * ww)
    win = c // ww
    tok = r * ww + c % ww
    sel = np.zeros((PN, N), np.float32)
    sel[n, tok] = 1.0
    selj = jnp.asarray(sel)
    out = jnp.einsum("pn,hnm,qm->hpq", selj, bias.astype(jnp.float32), selj)
    offdiag = jnp.asarray((win[:, None] != win[None, :]) * -1e9, jnp.float32)
    return (out + offdiag[None]).astype(out_dtype)


def raster_bands(bands, x_size: Size2, window: Size2, pack_w: int):
    """(nW, N) per-window band ids -> (nGy, nGx, P*N) in kernel raster order.

    nW windows are row-major over (H/wh, W/ww); group (i, j) packs windows
    j*P..j*P+P-1 of window-row i.  Pure reshape/transpose (no gather).
    """
    H, W = x_size
    wh, ww = window
    nWy, nWx = H // wh, W // ww
    b = bands.reshape(nWy, nWx, wh, ww)
    b = b.reshape(nWy, nWx // pack_w, pack_w, wh, ww)
    b = b.transpose(0, 1, 3, 2, 4)  # (nGy, nGx, wh, P, ww)
    return b.reshape(nWy, nWx // pack_w, pack_w * wh * ww)


def _lrot_cols(xr, shift: int, interp: bool):
    """Left-rotate the second-minor (sublane) axis of (rows, W, C) by
    `shift` inside a kernel.  pltpu.roll requires non-negative shifts (same
    right-roll convention as jnp.roll) and cannot rotate 16-bit data —
    bitcast packs ADJACENT second-minor pairs into one int32, so a roll by
    (W - shift)/2 int32 rows rotates 16-bit columns by W - shift (shift
    must be even for 16-bit inputs; guarded at the boundary)."""
    W = xr.shape[1]
    if interp:
        return jnp.roll(xr, W - shift, axis=1)
    if xr.dtype.itemsize == 4:
        return pltpu.roll(xr, W - shift, axis=1)
    xi = pltpu.bitcast(xr, jnp.int32)              # (rows, W/2, C)
    xi = pltpu.roll(xi, (W - shift) // 2, axis=1)
    return pltpu.bitcast(xi, xr.dtype)             # (rows, W, C)


def _window_block_kernel(*refs, num_heads: int, n_groups: int,
                         window: Size2, pack_w: int, has_bands: bool,
                         q_tile: int = 0, row_steps: int = 1,
                         shift: int = 0, interp: bool = False,
                         mm=jnp.bfloat16):
    if shift:
        # in-kernel shift: x arrives UNROLLED as two half-window row bands
        # (the same array under two BlockSpecs); stitch rows, rotate columns
        # — the XLA-side roll copy (16 MB write+read per shifted half at
        # GRL-S) never exists.
        x1_ref, x2_ref, *refs = refs
    else:
        x_ref, *refs = refs
    w_ref, b_ref, scale_ref, bias_ref, *rest = refs
    if has_bands:
        bands_ref, o_ref = rest
    else:
        (o_ref,) = rest
    wh, ww = window
    GW = pack_w * ww              # columns per packed group
    PN = wh * GW                  # tokens per packed attention
    h = num_heads
    C3 = w_ref.shape[1]
    Cw = C3 // 3
    d = Cw // h

    w = w_ref[...]                # (C, 3Cw) bf16
    bvec = b_ref[...]             # (1, 3Cw) fp32 (or zeros)
    scale = scale_ref[...].reshape(1, h, 1, 1)
    bias = bias_ref[...]          # (h, PN, PN) (block-diag folded in)

    if shift:
        xr = jnp.concatenate([x1_ref[0], x2_ref[0]], axis=0)  # (wh, W, C)
        xfull = _lrot_cols(xr, shift, interp)
    else:
        xfull = x_ref[0]

    # static unrolls: all slices stay static.  row_steps window rows per
    # grid step amortize the Mosaic per-step overhead (measured NEUTRAL at
    # GRL-S — kept as an experiment knob, default 1)
    for r, g in [(r, g) for r in range(row_steps) for g in range(n_groups)]:
        xb = xfull[r * wh:(r + 1) * wh]       # (wh, n_groups*GW, C)
        xg = xb[:, g * GW:(g + 1) * GW, :].reshape(PN, -1)
        # qkv transposed: (3Cw, PN) — head split touches sublanes only
        qkvT = jax.lax.dot_general(
            w, xg, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bvec.reshape(-1, 1)
        qkv = qkvT.reshape(3, h, d, PN)
        q, k, v = qkv[0], qkv[1], qkv[2]
        qn = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, 1, keepdims=True), 1e-24))
        kn = k * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(k * k, 1, keepdims=True), 1e-24))
        # fold the per-head logit scale into q BEFORE the QK^T dot: an
        # (h, d, N) multiply instead of an (h, N, N) one (the VPU passes
        # over the quadratic matrix are the latency tail — PERF_ANALYSIS
        # round-5 softmax-chain cut)
        qn = qn * scale[0]
        bg = bands_ref[0, r, 0, g] if has_bands else None   # (PN,) int32
        vb = v.astype(mm)
        knb = kn.astype(mm)

        def _attend(qt, bias_rows, bg_rows):
            """One q-tile: (h, d, Nq) queries vs the full window's k/v."""
            attn = jax.lax.dot_general(
                qt.astype(mm), knb,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                      # (h, Nq, PN)
            attn = attn + bias_rows
            if bg_rows is not None:
                attn = attn + jnp.where(
                    bg[None, None, :] != bg_rows[None, :, None], -100.0, 0.0)
            # deferred-normalization softmax: AV runs on exp(attn - max);
            # the 1/rowsum multiply lands on the (Nq, d) output — d/PN as
            # many elements as normalizing the matrix itself
            attn = attn - jnp.max(attn, axis=-1, keepdims=True)
            e = jnp.exp(attn)
            rs = 1.0 / jnp.sum(e, axis=-1)       # (h, Nq)
            eb = e.astype(mm)
            # per-head AV emits (Nq, d) DIRECTLY (tokens-major), so the NHWC
            # write needs no transpose; heads concat on the lane axis.  (An
            # MXU eye-transpose here cost more FLOPs than the attention.)
            return jnp.concatenate([
                jax.lax.dot_general(
                    eb[i], vb[i],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * rs[i][:, None]  # (Nq, d)
                for i in range(h)
            ], axis=-1)            # (Nq, Cw)

        if not q_tile:
            yt = _attend(qn, bias, bg)
            o_ref[0, r * wh:(r + 1) * wh, g * GW:(g + 1) * GW, :] = (
                yt.reshape(wh, GW, Cw).astype(o_ref.dtype))
        else:
            # large-window path (GRL-base w32: PN=1024): the (h, PN, PN)
            # fp32 attention never fits VMEM next to the bias — walk q in
            # row tiles against the full resident k/v.  q_tile is a
            # multiple of GW, so each tile writes whole raster rows.
            rows = q_tile // GW
            for qi in range(PN // q_tile):
                sl = slice(qi * q_tile, (qi + 1) * q_tile)
                yt = _attend(qn[:, :, sl], bias[:, sl, :],
                             bg[sl] if has_bands else None)
                o_ref[0, r * wh + qi * rows:r * wh + (qi + 1) * rows,
                      g * GW:(g + 1) * GW, :] = (
                    yt.reshape(rows, GW, Cw).astype(o_ref.dtype))


def fused_window_half(x, wqkv, bqkv, logit_scale, bias, window: Size2,
                      bands=None, shift: int = 0,
                      pack_w: Optional[int] = None,
                      groups_per_step: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      ref: bool = False):
    """Whole window-half: NHWC x -> NHWC attention output (pre-proj).

    x: (B, H, W, C); wqkv: (C, 3Cw) this half's projection slice; bqkv:
    (3Cw,) or None; bias: (h, N, N) fp32 from AffineTransform.bias; bands:
    (nW, N) int32 shift band ids or None.  shift: the cyclic window shift —
    when given, x arrives UNROLLED and the kernel stitches the rolled view
    in VMEM (two half-window row refs + a column rotate), so the roll copy
    never hits HBM; geometries the in-kernel path can't serve fall back to
    a jnp.roll here.  (The OUTPUT stays in rolled coordinates either way —
    the caller un-rolls y exactly as with a pre-rolled x.)  Returns y:
    (B, H, W, Cw).  ref=True runs the pure-XLA twin on the SAME prepared
    boundary operands (device-parity certification, tools/bench_v3.py
    parity stage).
    """
    if interpret is None:
        interpret = _interpret_default()
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    B, H, W, C = x.shape
    wh, ww = window
    C3 = wqkv.shape[1]
    Cw = C3 // 3
    h = logit_scale.shape[0]
    N = wh * ww
    large = N > _LARGE_N
    if pack_w is None:
        pack_w = 1 if large else _auto_pack_w(W, window)
        env_p = int(os.environ.get("GRLIR_V3_PACKW", "0"))
        if env_p and not large and W // ww >= env_p \
                and (W // ww) % env_p == 0:
            pack_w = env_p  # experiment knob: block-diag waste scales with P
    PN = pack_w * wh * ww
    GW = pack_w * ww
    nGx = W // GW
    # large windows: q-row tiles sized to ~1.5 MB of fp32 attention
    q_tile = 0
    if large:
        q_tile = max(GW, (2 * 1024 * 1024 // (4 * h * PN)) // GW * GW)
        while PN % q_tile:
            q_tile -= GW
    if groups_per_step is None:
        if large:
            groups_per_step = 1
        else:
            # VMEM: x block + out block + per-group fp32 intermediates
            per_group = 4 * (2 * C3 * PN + (h + 1) * PN * PN + PN * C)
            blk = 2 * (wh * GW * C + wh * GW * Cw) * x.dtype.itemsize
            groups_per_step = max(1, min(nGx,
                                  (10 * 1024 * 1024 - per_group) // max(blk, 1)))
            while nGx % groups_per_step:
                groups_per_step -= 1
    nG = groups_per_step

    scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0))).reshape(h, 1)
    bias_packed = pack_window_bias(
        bias, window, pack_w,
        out_dtype=jnp.bfloat16 if large else jnp.float32)
    bq = (jnp.zeros((1, C3), jnp.float32) if bqkv is None
          else bqkv.reshape(1, C3).astype(jnp.float32))

    # window rows per grid step (experiment knob): packing R rows per step
    # amortizes the Mosaic per-step overhead, but measured NEUTRAL at GRL-S
    # (3.162 -> 3.18 MP/s whole-model for R=1 -> 4, within the variance
    # band; PERF_ANALYSIS round 5) and R=8's larger blocks flirt with the
    # 16 MB scoped-VMEM compile limit — so the default stays 1.
    R = int(os.environ.get("GRLIR_V3_ROWS", "1"))
    if large:
        R = 1
    R = max(1, min(R, H // wh))
    while ((H // wh) % R
           or R * wh * nG * GW * (C + Cw) * x.dtype.itemsize > 6 * 2**20):
        R -= 1

    # in-kernel shift: needs half-window row blocks (wh/2 rows each) and
    # grid steps that span FULL feature rows (the column rotate wraps W)
    ik_shift = 0
    if shift:
        s = int(shift)
        if (not large and wh % s == 0 and wh // s == 2
                and nG * GW == W and R == 1
                and (x.dtype.itemsize == 4 or s % 2 == 0)):
            ik_shift = s
        else:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))

    has_bands = bands is not None
    if has_bands:
        br = raster_bands(bands, (H, W), window, pack_w).astype(jnp.int32)
        br = br.reshape(H // (R * wh), R, nGx // nG, nG, PN)
    if ref:
        xr = x if not ik_shift else jnp.roll(
            x, (-ik_shift, -ik_shift), axis=(1, 2))
        args = (xr, wqkv.astype(mm), bq, scale, bias_packed)
        if has_bands:
            args += (br.reshape(H // wh, nGx // nG, nG, PN),)
        return _window_half_ref_xla(
            args, window=window, pack_w=pack_w, has_bands=has_bands,
            mm=mm, out_dtype=jnp.dtype(x.dtype))
    f = _window_half_fn(window, pack_w, nG, q_tile, has_bands,
                        str(mm.__name__), interpret,
                        str(jnp.dtype(x.dtype).name), row_steps=R,
                        shift=ik_shift)
    if has_bands:
        return f(x, wqkv.astype(mm), bq, scale, bias_packed, br)
    return f(x, wqkv.astype(mm), bq, scale, bias_packed)


def _window_half_kernel_call(args, *, window, pack_w, nG, q_tile, has_bands,
                             mm, interpret, out_dtype, row_steps=1,
                             shift=0):
    """Build + invoke the pallas_call for one static window geometry."""
    x = args[0]
    wh, ww = window
    B, H, W, C = x.shape
    C3 = args[1].shape[1]
    Cw = C3 // 3
    h = args[3].shape[0]
    GW = pack_w * ww
    PN = wh * GW
    nGx = W // GW
    R = row_steps
    grid = (B, H // (R * wh), nGx // nG)
    if shift:
        # two half-window row views of the UNROLLED x: window row i of the
        # rolled layout is x rows [i*wh+s, (i+1)*wh+s) mod H = half-blocks
        # 2i+1 and (2i+2) % nB; the kernel stitches them and rotates columns
        s = shift
        nB = H // s
        x_specs = [
            pl.BlockSpec((1, s, nG * GW, C),
                         lambda b, i, j: (b, 2 * i + 1, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, nG * GW, C),
                         lambda b, i, j, nB=nB: (b, (2 * i + 2) % nB, j, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        x_specs = [
            pl.BlockSpec((1, R * wh, nG * GW, C),
                         lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = x_specs + [
        pl.BlockSpec((C, C3), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C3), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, PN, PN), lambda b, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bands:
        in_specs.append(
            pl.BlockSpec((1, R, 1, nG, PN), lambda b, i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM))
    kernel = functools.partial(
        _window_block_kernel, num_heads=h, n_groups=nG, window=window,
        pack_w=pack_w, has_bands=has_bands, q_tile=q_tile, row_steps=R,
        shift=shift, interp=bool(interpret), mm=mm)
    call_args = (args[0], *args) if shift else args
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R * wh, nG * GW, Cw),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cw), out_dtype),
        interpret=interpret,
    )(*call_args)


def _window_half_ref_xla(args, *, window, pack_w, has_bands, mm, out_dtype):
    """Pure-XLA twin of the window kernel on the SAME boundary operands.

    Used as the recompute-in-backward body of the custom VJP (the design
    doc's training plan): gradients of the kernel are the gradients of this
    function — same math, same bf16 matmul / fp32 softmax discipline.
    """
    if has_bands:
        x, w, bq, scale, bias, br = args
    else:
        x, w, bq, scale, bias = args
    wh, ww = window
    B, H, W, C = x.shape
    C3 = w.shape[1]
    Cw = C3 // 3
    h = scale.shape[0]
    GW = pack_w * ww
    PN = wh * GW
    nbh, nbw = H // wh, W // GW
    d = Cw // h
    xg = x.reshape(B, nbh, wh, nbw, GW, C).transpose(0, 1, 3, 2, 4, 5)
    xg = xg.reshape(B, nbh, nbw, PN, C)
    qkvT = jnp.einsum("ck,bijnc->bijkn", w, xg,
                      preferred_element_type=jnp.float32)
    qkvT = qkvT + bq.reshape(1, 1, 1, C3, 1)
    qkv = qkvT.reshape(B, nbh, nbw, 3, h, d, PN)
    q, k, v = qkv[..., 0, :, :, :], qkv[..., 1, :, :, :], qkv[..., 2, :, :, :]

    def norm(t):
        return t * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(t * t, -2, keepdims=True), 1e-24))

    attn = jnp.einsum("...hdn,...hdm->...hnm", norm(q).astype(mm),
                      norm(k).astype(mm),
                      preferred_element_type=jnp.float32)
    attn = attn * scale.reshape(h, 1, 1) + bias.astype(jnp.float32)
    if has_bands:
        bg = br.reshape(nbh, nbw, PN)
        m = jnp.where(bg[:, :, None, :] != bg[:, :, :, None],
                      -100.0, 0.0)               # (nbh, nbw, PN, PN)
        attn = attn + m[None, :, :, None, :, :]  # align (B, ..., h, PN, PN)
    attn = jax.nn.softmax(attn, axis=-1).astype(mm)
    y = jnp.einsum("...hnm,...hdm->...nhd", attn, v.astype(mm),
                   preferred_element_type=jnp.float32)
    y = y.reshape(B, nbh, nbw, wh, GW, Cw).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, Cw).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _window_half_fn(window, pack_w, nG, q_tile, has_bands, mm_name,
                    interpret, out_dtype_name, row_steps=1, shift=0):
    """custom_vjp wrapper: Pallas kernel forward, pure-XLA recompute backward
    (pallas_call has no autodiff rule; without this, jax.grad through a
    v3-engaged model — GAN generator on TPU, cm-io training — crashes)."""
    mm = jnp.dtype(mm_name).type if mm_name != "bfloat16" else jnp.bfloat16
    out_dtype = jnp.dtype(out_dtype_name)
    kw = dict(window=window, pack_w=pack_w, has_bands=has_bands, mm=mm,
              out_dtype=out_dtype)

    @jax.custom_vjp
    def f(*args):
        return _window_half_kernel_call(args, nG=nG, q_tile=q_tile,
                                        row_steps=row_steps, shift=shift,
                                        interpret=interpret, **kw)

    def fwd(*args):
        return _window_half_kernel_call(args, nG=nG, q_tile=q_tile,
                                        row_steps=row_steps, shift=shift,
                                        interpret=interpret, **kw), args

    def bwd(res, g):
        def body(*a):
            if shift:
                # residual x is UNROLLED (in-kernel shift); the twin wants
                # the rolled view — jnp.roll's VJP un-rolls the gradient
                a = (jnp.roll(a[0], (-shift, -shift), axis=(1, 2)),) + a[1:]
            return _window_half_ref_xla(a, **kw)

        _, pullback = jax.vjp(body, *res)
        return pullback(g)

    f.defvjp(fwd, bwd)
    return f


def _stripe_block_kernel(*refs, num_heads: int,
                         has_bands: bool, stripe: Size2, anchor_size: Size2,
                         n_stripes: int, horizontal: bool,
                         shift: Size2 = (0, 0), interp: bool = False,
                         mm=jnp.bfloat16):
    if shift[0] or shift[1]:
        # in-kernel shift (horizontal stripes): x arrives UNROLLED as two
        # half-stripe row bands; stitch rows, rotate columns — the roll
        # copy never hits HBM.  The anchor (df^2-times smaller) is still
        # rolled outside.
        x1_ref, x2_ref, *refs = refs
    else:
        x_ref, *refs = refs
    a_ref, w_ref, b_ref, s1_ref, s2_ref, bias1_ref, bias2_ref, *rest = refs
    if has_bands:
        bands_ref, bands_a_ref, o_ref = rest
    else:
        (o_ref,) = rest
    h = num_heads
    C3 = w_ref.shape[1]
    Cs = C3 // 3
    d = Cs // h
    sh, sw = stripe
    ah, aw = anchor_size
    N1 = sh * sw
    N2 = ah * aw

    if shift[0] or shift[1]:
        xb = jnp.concatenate([x1_ref[0], x2_ref[0]], axis=0)
        xb = _lrot_cols(xb, shift[1], interp)   # (sh, nS*sw, C)
    else:
        xb = x_ref[0]              # (sh, nS*sw, C) or (nS*sh, sw, C)
    ab = a_ref[0, 0, 0]            # (nS*N2, Cs): pre-partitioned outside —
    # anchor stripes are too narrow (aw = sw/df < 8) for Mosaic sub-block
    # slicing, so the host pre-partitions anchor tokens per stripe (tiny copy)
    w = w_ref[...]
    bvec = b_ref[...].reshape(-1, 1)
    scale1 = s1_ref[...].reshape(h, 1, 1)
    scale2 = s2_ref[...].reshape(h, 1, 1)

    def _norm(t):
        return t * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(t * t, 1, keepdims=True), 1e-24))

    eye_cs = jnp.eye(Cs, dtype=mm)

    for s in range(n_stripes):     # static unroll: slices stay static
        if horizontal:
            xg = xb[:, s * sw:(s + 1) * sw, :].reshape(N1, -1)
        else:
            xg = xb[s * sh:(s + 1) * sh, :, :].reshape(N1, -1)
        ag = ab[s * N2:(s + 1) * N2, :]

        qkvT = jax.lax.dot_general(
            w, xg, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bvec
        qkv = qkvT.reshape(3, h, d, N1)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # anchor transposed to (h, d, N2) via MXU contraction with identity
        aT = jax.lax.dot_general(
            eye_cs, ag.astype(mm),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h, d, N2)

        qn, kn, an = _norm(q), _norm(k), _norm(aT)
        # fold the logit scales into the SINGLE-use operands (kn only feeds
        # attn1, qn only feeds attn2t; an feeds both so it stays unscaled):
        # (h, d, N) multiplies replace two (h, N2, N1) ones
        kn = kn * scale1
        qn = qn * scale2

        # ---- anchor <- stripe aggregation (a2w)
        attn1 = jax.lax.dot_general(
            an.astype(mm), kn.astype(mm),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                          # (h, N2, N1)
        attn1 = attn1 + bias1_ref[...]
        if has_bands:
            bs = bands_ref[0, 0, s]
            ba = bands_a_ref[0, 0, s]
            attn1 = attn1 + jnp.where(
                ba[None, :, None] != bs[None, None, :], -100.0, 0.0)
        # deferred-normalization softmax over N1 (lanes): AV runs on the
        # unnormalized exp; 1/rowsum scales the (h, d, N2) output instead
        attn1 = attn1 - jnp.max(attn1, axis=-1, keepdims=True)
        e1 = jnp.exp(attn1)
        rs1 = 1.0 / jnp.sum(e1, axis=-1)        # (h, N2)
        x1 = jax.lax.dot_general(
            v.astype(mm), e1.astype(mm),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * rs1[:, None, :]        # (h, d, N2)

        # ---- stripe <- anchor redistribution (w2a), computed TRANSPOSED:
        # attn2T (h, N2, N1) keeps lanes at N1 (unpadded; N2=32 as minor
        # would pad 4x) and the softmax reduces over the sublane axis
        attn2t = jax.lax.dot_general(
            an.astype(mm), qn.astype(mm),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                          # (h, N2, N1)
        attn2t = attn2t + bias2_ref[...]
        if has_bands:
            attn2t = attn2t + jnp.where(
                ba[None, :, None] != bs[None, None, :], -100.0, 0.0)
        # deferred normalization over N2 (sublanes): 1/colsum scales the
        # (N1, d) per-head outputs
        attn2t = attn2t - jnp.max(attn2t, axis=-2, keepdims=True)
        e2 = jnp.exp(attn2t)
        rs2 = 1.0 / jnp.sum(e2, axis=-2)        # (h, N1)
        e2b = e2.astype(mm)
        # per-head output emits (N1, d) directly (tokens-major NHWC write);
        # heads concat on the lane axis — no MXU eye-transpose
        x1b = x1.astype(mm)
        heads = [
            jax.lax.dot_general(
                e2b[i], x1b[i],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * rs2[i][:, None]    # (N1, d)
            for i in range(h)
        ]
        yt = jnp.concatenate(heads, axis=-1).reshape(
            sh, sw, Cs).astype(o_ref.dtype)
        if horizontal:
            o_ref[0, :, s * sw:(s + 1) * sw, :] = yt
        else:
            o_ref[0, s * sh:(s + 1) * sh, :, :] = yt


def fused_stripe_half(x, anchor, wqkv, bqkv, logit_scale1, logit_scale2,
                      bias_a2w, bias_w2a, stripe: Size2, df: int,
                      bands=None, bands_a=None, shift: Size2 = (0, 0),
                      interpret: Optional[bool] = None,
                      ref: bool = False):
    """Whole anchored-stripe half: NHWC x + anchor -> NHWC output (pre-proj).

    x: (B, H, W, C); anchor: (B, H/df, W/df, Cs) (PRE-ROLLED when shifted —
    the anchor roll is df^2-times cheaper and stays outside); wqkv:
    (C, 3Cs); biases fp32 (h, N2, N1) / (h, N1, N2); bands/bands_a:
    (nW, N1)/(nW, N2) int32 or None.  shift: the cyclic stripe shift for x —
    when given, x arrives UNROLLED and horizontal-stripe geometries stitch
    the rolled view inside the kernel (two half-stripe row refs + a column
    rotate); other geometries fall back to a jnp.roll here.  The output is
    in rolled coordinates either way (the caller un-rolls y).  Returns
    (B, H, W, Cs).  ref=True runs the pure-XLA twin on the SAME prepared
    boundary operands (device-parity certification, tools/bench_v3.py
    parity stage).
    """
    if interpret is None:
        interpret = _interpret_default()
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    B, H, W, C = x.shape
    sh, sw = stripe
    ah, aw = sh // df, sw // df
    C3 = wqkv.shape[1]
    Cs = C3 // 3
    h = logit_scale1.shape[0]
    N1, N2 = sh * sw, ah * aw
    nWy, nWx = H // sh, W // sw
    # pack several stripes per grid step (static in-kernel loop) so the
    # Mosaic per-step overhead amortizes; stripes extend along their long
    # axis, so packing walks the SHORT axis (cols for horizontal stripes)
    large = not _stripe_resident_supported(tuple(stripe), df, h)
    horizontal = True if large else sw >= sh
    if large:
        nS = 1  # the streamed-bias kernels pack stripes themselves
    else:
        n_packable = nWx if horizontal else nWy
        nS = min(n_packable, max(1, 4096 // N1))
        while n_packable % nS:
            nS -= 1
    # in-kernel x shift: horizontal resident path only (the vertical
    # half-column blocks would violate Mosaic's 8-sublane block rule)
    ik_shift = (0, 0)
    if shift[0] or shift[1]:
        ssh, ssw = int(shift[0]), int(shift[1])
        if (not large and horizontal and ssh and ssw
                and sh % ssh == 0 and sh // ssh == 2 and H % ssh == 0
                and nS * sw == W
                and (x.dtype.itemsize == 4 or ssw % 2 == 0)):
            ik_shift = (ssh, ssw)
        else:
            x = jnp.roll(x, (-ssh, -ssw), axis=(1, 2))
    # anchor stripes are narrower than Mosaic's minimum sublane block (e.g.
    # aw=2 for vertical stripes): pre-partition anchor tokens per stripe so
    # the kernel takes static (N2, Cs) row slices.  Tiny copy: the anchor is
    # df^2-x smaller than x.
    from grlir.ops.layout import window_partition

    a_tok = window_partition(anchor, (ah, aw))  # (B, nA, N2, Cs) row-major
    if horizontal:
        a_tok = a_tok.reshape(B, nWy, nWx // nS, nS * N2, Cs)
    else:
        a_tok = a_tok.reshape(B, nWy // nS, nS, nWx, N2, Cs).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, nWy // nS, nWx, nS * N2, Cs)

    s1 = jnp.exp(jnp.minimum(logit_scale1, math.log(100.0))).reshape(h, 1)
    s2 = jnp.exp(jnp.minimum(logit_scale2, math.log(100.0))).reshape(h, 1)
    bq = (jnp.zeros((1, C3), jnp.float32) if bqkv is None
          else bqkv.reshape(1, C3).astype(jnp.float32))

    # large path: biases stream from HBM per tile — store them at the matmul
    # dtype (bf16 halves the dominant streamed traffic; device parity
    # certified in tools/bench_v3.py stage parity)
    bias_store = mm if large else jnp.float32
    args = [x, a_tok, wqkv.astype(mm), bq, s1, s2,
            bias_a2w.astype(bias_store),
            jnp.swapaxes(bias_w2a, 1, 2).astype(bias_store)]
    has_bands = bands is not None
    assert (bands is None) == (bands_a is None), (bands, bands_a)
    if has_bands:
        # band ids arrive per window (nW, N) row-major over (nWy, nWx);
        # group them to match the packed grid blocks
        if horizontal:
            bsr = bands.reshape(nWy, nWx // nS, nS, N1)
            bar = bands_a.reshape(nWy, nWx // nS, nS, N2)
        else:
            bsr = bands.reshape(nWy // nS, nS, nWx, N1).transpose(0, 2, 1, 3)
            bar = bands_a.reshape(nWy // nS, nS, nWx, N2).transpose(0, 2, 1, 3)
        args += [bsr.astype(jnp.int32), bar.astype(jnp.int32)]

    if ref:
        if ik_shift != (0, 0):
            args[0] = jnp.roll(x, (-ik_shift[0], -ik_shift[1]), axis=(1, 2))
        return _stripe_half_ref_xla(
            tuple(args), stripe=tuple(stripe), anchor=(ah, aw), nS=nS,
            horizontal=bool(horizontal), has_bands=has_bands, mm=mm,
            out_dtype=jnp.dtype(x.dtype))
    if large:
        n2t, n1t = _stripe_large_tiles(tuple(stripe), df, h)
        P = 2 if nWx % 2 == 0 else 1
        # VMEM guard on kernel A's per-step residents: x block + k/v scratch
        while P > 1 and (P * sh * sw * C * x.dtype.itemsize
                         + 2 * P * Cs * N1 * 2) > 8 * 1024 * 1024:
            P -= 1
        f = _stripe_half_large_fn(tuple(stripe), (ah, aw), P, n2t, n1t,
                                  has_bands, str(mm.__name__), interpret,
                                  str(jnp.dtype(x.dtype).name))
        return f(*args)
    f = _stripe_half_fn(tuple(stripe), (ah, aw), nS, bool(horizontal),
                        has_bands, str(mm.__name__), interpret,
                        str(jnp.dtype(x.dtype).name), shift=ik_shift)
    return f(*args)


def _stripe_half_kernel_call(args, *, stripe, anchor, nS, horizontal,
                             has_bands, mm, interpret, out_dtype,
                             shift=(0, 0)):
    """Build + invoke the pallas_call for one static stripe geometry."""
    x = args[0]
    B, H, W, C = x.shape
    sh, sw = stripe
    ah, aw = anchor
    N1, N2 = sh * sw, ah * aw
    C3 = args[2].shape[1]
    Cs = C3 // 3
    h = args[4].shape[0]
    nWy, nWx = H // sh, W // sw
    if horizontal:
        grid = (B, nWy, nWx // nS)
        xblk = (1, sh, nS * sw, C)
        oblk = (1, sh, nS * sw, Cs)
    else:
        grid = (B, nWy // nS, nWx)
        xblk = (1, nS * sh, sw, C)
        oblk = (1, nS * sh, sw, Cs)
    if shift != (0, 0):
        # two half-stripe row views of the UNROLLED x (horizontal only;
        # see fused_stripe_half): stripe row i of the rolled layout =
        # half-blocks 2i+1 and (2i+2) % nB
        ssh = shift[0]
        nB = H // ssh
        x_specs = [
            pl.BlockSpec((1, ssh, nS * sw, C),
                         lambda b, i, j: (b, 2 * i + 1, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ssh, nS * sw, C),
                         lambda b, i, j, nB=nB: (b, (2 * i + 2) % nB, j, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        x_specs = [
            pl.BlockSpec(xblk, lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = x_specs + [
        pl.BlockSpec((1, 1, 1, nS * N2, Cs), lambda b, i, j: (b, i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C3), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C3), lambda b, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, N2, N1), lambda b, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        # w2a bias transposed: the kernel computes attn2 transposed so its
        # lanes stay at N1 (see _stripe_block_kernel)
        pl.BlockSpec((h, N2, N1), lambda b, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bands:
        in_specs.append(
            pl.BlockSpec((1, 1, nS, N1), lambda b, i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((1, 1, nS, N2), lambda b, i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM))
    kernel = functools.partial(_stripe_block_kernel, num_heads=h,
                               has_bands=has_bands, stripe=stripe,
                               anchor_size=anchor, n_stripes=nS,
                               horizontal=horizontal, shift=shift,
                               interp=bool(interpret), mm=mm)
    call_args = (args[0], *args) if shift != (0, 0) else args
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(oblk, lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cs), out_dtype),
        interpret=interpret,
    )(*call_args)


def _stripe_half_ref_xla(args, *, stripe, anchor, nS, horizontal, has_bands,
                         mm, out_dtype):
    """Pure-XLA twin of the stripe kernel on the SAME boundary operands
    (recompute-in-backward body of the custom VJP)."""
    if has_bands:
        x, a_tok, w, bq, s1, s2, b1, b2t, bsr, bar = args
    else:
        x, a_tok, w, bq, s1, s2, b1, b2t = args
    sh, sw = stripe
    ah, aw = anchor
    N1, N2 = sh * sw, ah * aw
    B, H, W, C = x.shape
    C3 = w.shape[1]
    Cs = C3 // 3
    h = s1.shape[0]
    d = Cs // h
    if horizontal:
        gy, gx = H // sh, W // (nS * sw)
        xg = x.reshape(B, gy, sh, gx, nS, sw, C).transpose(0, 1, 3, 4, 2, 5, 6)
    else:
        gy, gx = H // (nS * sh), W // sw
        xg = x.reshape(B, gy, nS, sh, gx, sw, C).transpose(0, 1, 4, 2, 3, 5, 6)
    xg = xg.reshape(B, gy, gx, nS, N1, C)
    ag = a_tok.reshape(B, gy, gx, nS, N2, Cs)

    qkvT = jnp.einsum("ck,bijsnc->bijskn", w, xg,
                      preferred_element_type=jnp.float32)
    qkvT = qkvT + bq.reshape(1, 1, 1, 1, C3, 1)
    qkv = qkvT.reshape(B, gy, gx, nS, 3, h, d, N1)
    q, k, v = (qkv[..., 0, :, :, :], qkv[..., 1, :, :, :],
               qkv[..., 2, :, :, :])
    aT = ag.swapaxes(-1, -2).reshape(B, gy, gx, nS, h, d, N2)

    def norm(t):
        return t * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(t * t, -2, keepdims=True), 1e-24))

    qn, kn, an = norm(q), norm(k), norm(aT.astype(jnp.float32))
    if has_bands:
        m = jnp.where(bar[..., :, None] != bsr[..., None, :],
                      -100.0, 0.0)                 # (gy, gx, nS, N2, N1)
        m = m[None, :, :, :, None, :, :]           # align (B,...,h,N2,N1)

    attn1 = jnp.einsum("...hda,...hdk->...hak", an.astype(mm), kn.astype(mm),
                       preferred_element_type=jnp.float32)
    attn1 = attn1 * s1.reshape(h, 1, 1) + b1
    if has_bands:
        attn1 = attn1 + m
    attn1 = jax.nn.softmax(attn1, axis=-1)
    x1 = jnp.einsum("...hak,...hdk->...hda", attn1.astype(mm), v.astype(mm),
                    preferred_element_type=jnp.float32)  # (h, d, N2)

    attn2t = jnp.einsum("...hda,...hdk->...hak", an.astype(mm),
                        qn.astype(mm), preferred_element_type=jnp.float32)
    attn2t = attn2t * s2.reshape(h, 1, 1) + b2t
    if has_bands:
        attn2t = attn2t + m
    attn2t = jax.nn.softmax(attn2t, axis=-2)
    y = jnp.einsum("...hak,...hda->...khd", attn2t.astype(mm),
                   x1.astype(mm), preferred_element_type=jnp.float32)
    y = y.reshape(B, gy, gx, nS, N1, Cs)
    if horizontal:
        y = y.reshape(B, gy, gx, nS, sh, sw, Cs).transpose(
            0, 1, 4, 2, 3, 5, 6).reshape(B, H, W, Cs)
    else:
        y = y.reshape(B, gy, gx, nS, sh, sw, Cs).transpose(
            0, 1, 3, 4, 2, 5, 6).reshape(B, H, W, Cs)
    return y.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _stripe_half_fn(stripe, anchor, nS, horizontal, has_bands, mm_name,
                    interpret, out_dtype_name, shift=(0, 0)):
    """custom_vjp wrapper: Pallas kernel forward, pure-XLA recompute backward
    (see _window_half_fn)."""
    mm = jnp.dtype(mm_name).type if mm_name != "bfloat16" else jnp.bfloat16
    out_dtype = jnp.dtype(out_dtype_name)
    kw = dict(stripe=stripe, anchor=anchor, nS=nS, horizontal=horizontal,
              has_bands=has_bands, mm=mm, out_dtype=out_dtype)

    @jax.custom_vjp
    def f(*args):
        return _stripe_half_kernel_call(args, interpret=interpret,
                                        shift=shift, **kw)

    def fwd(*args):
        return _stripe_half_kernel_call(args, interpret=interpret,
                                        shift=shift, **kw), args

    def bwd(res, g):
        def body(*a):
            if shift != (0, 0):
                # residual x is UNROLLED (in-kernel shift); the twin wants
                # the rolled view — jnp.roll's VJP un-rolls the gradient
                a = (jnp.roll(a[0], (-shift[0], -shift[1]),
                              axis=(1, 2)),) + a[1:]
            return _stripe_half_ref_xla(a, **kw)

        _, pullback = jax.vjp(body, *res)
        return pullback(g)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# Large-stripe streamed-bias path (GRL-base w32/df2 eval tiles: stripe 64x64,
# N1=4096, N2=1024 — biases ~50 MB/direction, nothing resident in VMEM).
# Replaces the XLA fallback that kept the GRL-base tile at ~316 ms (round-4
# verdict item 3).  Reference hot loop:
# /root/reference/models/common/mixed_attn_block_efficient.py:128-270.
# ---------------------------------------------------------------------------


def _norm_rows(t):
    return t * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(t * t, 1, keepdims=True), 1e-24))


def _stripe_a2w_large_kernel(x_ref, a_ref, w_ref, b_ref, s1_ref, bias_ref,
                             *rest, num_heads: int, stripe: Size2,
                             n_pack: int, has_bands: bool, mm=jnp.bfloat16):
    """anchor <- stripe aggregation, one (P stripes, N2-tile) grid step.

    Softmax reduces over N1, which is FULLY resident per step (only the
    anchor rows are tiled), so no online-softmax state is needed.  k/v for
    the P packed stripes are projected once at t==0 into VMEM scratch."""
    if has_bands:
        bands_s_ref, bands_a_ref, o_ref, kn_scr, v_scr = rest
    else:
        o_ref, kn_scr, v_scr = rest
    t = pl.program_id(3)
    h = num_heads
    C3 = w_ref.shape[1]
    Cs = C3 // 3
    d = Cs // h
    sh, sw = stripe
    N1 = sh * sw
    w = w_ref[...]                     # (C, 3Cs) mm
    bvec = b_ref[...].reshape(-1, 1)   # (3Cs, 1) fp32
    scale1 = s1_ref[...].reshape(h, 1, 1)

    @pl.when(t == 0)
    def _project_kv():
        for s in range(n_pack):
            xg = x_ref[0][:, s * sw:(s + 1) * sw, :].reshape(N1, -1)
            kvT = jax.lax.dot_general(
                w[:, Cs:], xg, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bvec[Cs:]
            kv = kvT.reshape(2, h, d, N1)
            kn_scr[s] = _norm_rows(kv[0]).astype(mm)
            v_scr[s] = kv[1].astype(mm)

    bias = bias_ref[...].astype(jnp.float32)   # (h, n2t, N1)
    eye_cs = jnp.eye(Cs, dtype=mm)
    for s in range(n_pack):
        ag = a_ref[0, 0, s]                    # (n2t, Cs)
        aT = jax.lax.dot_general(
            eye_cs, ag.astype(mm),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h, d, -1)
        an = _norm_rows(aT)
        attn = jax.lax.dot_general(
            an.astype(mm), kn_scr[s],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                      # (h, n2t, N1)
        attn = attn * scale1 + bias
        if has_bands:
            bs = bands_s_ref[0, s, 0]          # (N1,)
            ba = bands_a_ref[0, s, 0, 0]       # (n2t,) from the 5D reshape
            attn = attn + jnp.where(
                ba[None, :, None] != bs[None, None, :], -100.0, 0.0)
        attn = jax.nn.softmax(attn, axis=-1)
        # x1 laid out (h, n2t, d): the tiled N2 axis must sit SECOND-TO-LAST
        # (Mosaic: last block dim % 128 or full; d=Cs/h is full, n2t % 8)
        x1 = jax.lax.dot_general(
            attn.astype(mm), v_scr[s],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                      # (h, n2t, d)
        o_ref[0, 0, s] = x1.astype(o_ref.dtype)


def _stripe_w2a_large_kernel(x_ref, a_ref, x1_ref, w_ref, b_ref, s2_ref,
                             bias_ref, *rest, num_heads: int, stripe: Size2,
                             n_pack: int, has_bands: bool, mm=jnp.bfloat16):
    """stripe <- anchor redistribution, one (P stripes, N1 row-band) step.

    Softmax reduces over N2 (anchors), fully resident per step; the stripe
    tokens are tiled in row bands, so each q token is projected exactly once
    (the x BlockSpec walks the bands).  Anchors are projected once at t==0."""
    if has_bands:
        bands_s_ref, bands_a_ref, o_ref, an_scr = rest
    else:
        o_ref, an_scr = rest
    t = pl.program_id(3)
    h = num_heads
    C3 = w_ref.shape[1]
    Cs = C3 // 3
    d = Cs // h
    sh, sw = stripe
    rows = x_ref.shape[1]
    n1t = rows * sw
    w = w_ref[...]
    bvec = b_ref[...].reshape(-1, 1)
    scale2 = s2_ref[...].reshape(h, 1, 1)
    eye_cs = jnp.eye(Cs, dtype=mm)

    @pl.when(t == 0)
    def _project_anchor():
        for s in range(n_pack):
            ag = a_ref[0, 0, s]                # (N2, Cs)
            aT = jax.lax.dot_general(
                eye_cs, ag.astype(mm),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(h, d, -1)
            an_scr[s] = _norm_rows(aT).astype(mm)

    bias = bias_ref[...].astype(jnp.float32)   # (h, N2, n1t)
    for s in range(n_pack):
        xg = x_ref[0][:, s * sw:(s + 1) * sw, :].reshape(n1t, -1)
        qT = jax.lax.dot_general(
            w[:, :Cs], xg, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bvec[:Cs]
        qn = _norm_rows(qT.reshape(h, d, n1t))
        attn2t = jax.lax.dot_general(
            an_scr[s], qn.astype(mm),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                      # (h, N2, n1t)
        attn2t = attn2t * scale2 + bias
        if has_bands:
            bs = bands_s_ref[0, s, 0]          # (n1t,)
            ba = bands_a_ref[0, s, 0]          # (N2,)
            attn2t = attn2t + jnp.where(
                ba[None, :, None] != bs[None, None, :], -100.0, 0.0)
        attn2t = jax.nn.softmax(attn2t, axis=-2).astype(mm)
        x1b = x1_ref[0, 0, s].astype(mm)       # (h, N2, d)
        heads = [
            jax.lax.dot_general(
                attn2t[i], x1b[i],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                  # (n1t, d)
            for i in range(h)
        ]
        yt = jnp.concatenate(heads, axis=-1).reshape(
            rows, sw, Cs).astype(o_ref.dtype)
        o_ref[0, :, s * sw:(s + 1) * sw, :] = yt


def _stripe_half_large_call(args, *, stripe, anchor, P, n2t, n1t, has_bands,
                            mm, interpret, out_dtype):
    """Two-pallas_call forward: a2w (x1 via HBM, ~0.5 MB/stripe bf16) then
    w2a.  Grid (B, nWy, nWx/P, tile); bias tiles stream per step and are
    reused across the P packed stripes."""
    if has_bands:
        x, a_tok, w, bq, s1, s2, b1, b2t, bsr, bar = args
    else:
        x, a_tok, w, bq, s1, s2, b1, b2t = args
    B, H, W, C = x.shape
    sh, sw = stripe
    ah, aw = anchor
    N1, N2 = sh * sw, ah * aw
    C3 = w.shape[1]
    Cs = C3 // 3
    h = s1.shape[0]
    d = Cs // h
    nWy, nWx = H // sh, W // sw
    nT2, nT1 = N2 // n2t, N1 // n1t
    rows = n1t // sw

    const = lambda *blk: pl.BlockSpec(blk, lambda b, i, j, t: (0,) * len(blk),
                                      memory_space=pltpu.VMEM)
    kw_a = dict(num_heads=h, stripe=stripe, n_pack=P, has_bands=has_bands,
                mm=mm)

    in_specs_a = [
        pl.BlockSpec((1, sh, P * sw, C), lambda b, i, j, t: (b, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, n2t, Cs), lambda b, i, j, t: (b, i, j, t, 0),
                     memory_space=pltpu.VMEM),
        const(C, C3), const(1, C3), const(h, 1),
        pl.BlockSpec((h, n2t, N1), lambda b, i, j, t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bands:
        # anchor band ids tile along N2 with n2t blocks that need not be
        # lane-aligned (% 128): reshape so n2t IS the full last dim
        bar5 = bar.reshape(nWy, nWx, nT2, 1, n2t)
        in_specs_a += [
            pl.BlockSpec((1, P, 1, N1), lambda b, i, j, t: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1, 1, n2t),
                         lambda b, i, j, t: (i, j, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    # band ids arrive (nWy, nWx, 1, N) (the nS=1 grouping); a (1, P, 1, N)
    # block with index (i, j, 0, ...) covers the step's P stripes directly
    a_args = [x, a_tok, w, bq, s1, b1]
    if has_bands:
        a_args += [bsr, bar5]
    x1 = pl.pallas_call(
        functools.partial(_stripe_a2w_large_kernel, **kw_a),
        grid=(B, nWy, nWx // P, nT2),
        in_specs=in_specs_a,
        out_specs=pl.BlockSpec((1, 1, P, h, n2t, d),
                               lambda b, i, j, t: (b, i, j, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nWy, nWx, h, N2, d), mm),
        scratch_shapes=[
            pltpu.VMEM((P, h, d, N1), mm),
            pltpu.VMEM((P, h, d, N1), mm),
        ],
        # blocks + scratch + fp32 attention temporaries exceed the 16 MB
        # scoped-vmem default at GRL-base geometry (measured 18.4 MB);
        # v5e VMEM is 128 MB — raise the scoped cap, keep double-buffering
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*a_args)

    in_specs_b = [
        pl.BlockSpec((1, rows, P * sw, C),
                     lambda b, i, j, t, nT1=nT1: (b, i * nT1 + t, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, N2, Cs), lambda b, i, j, t: (b, i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, h, N2, d),
                     lambda b, i, j, t: (b, i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const(C, C3), const(1, C3), const(h, 1),
        pl.BlockSpec((h, N2, n1t), lambda b, i, j, t: (0, 0, t),
                     memory_space=pltpu.VMEM),
    ]
    if has_bands:
        in_specs_b += [
            pl.BlockSpec((1, P, 1, n1t), lambda b, i, j, t: (i, j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1, N2), lambda b, i, j, t: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    b_args = [x, a_tok, x1, w, bq, s2, b2t]
    if has_bands:
        b_args += [bsr, bar]
    kw_b = dict(num_heads=h, stripe=stripe, n_pack=P, has_bands=has_bands,
                mm=mm)
    return pl.pallas_call(
        functools.partial(_stripe_w2a_large_kernel, **kw_b),
        grid=(B, nWy, nWx // P, nT1),
        in_specs=in_specs_b,
        out_specs=pl.BlockSpec((1, rows, P * sw, Cs),
                               lambda b, i, j, t, nT1=nT1: (b, i * nT1 + t,
                                                            j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cs), out_dtype),
        scratch_shapes=[pltpu.VMEM((P, h, d, N2), mm)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*b_args)


@functools.lru_cache(maxsize=None)
def _stripe_half_large_fn(stripe, anchor, P, n2t, n1t, has_bands, mm_name,
                          interpret, out_dtype_name):
    """custom_vjp wrapper for the streamed-bias large-stripe path: two
    Pallas kernels forward, pure-XLA recompute backward (nS=1 twin)."""
    mm = jnp.dtype(mm_name).type if mm_name != "bfloat16" else jnp.bfloat16
    out_dtype = jnp.dtype(out_dtype_name)
    kw = dict(stripe=stripe, anchor=anchor, P=P, n2t=n2t, n1t=n1t,
              has_bands=has_bands, mm=mm, out_dtype=out_dtype)
    ref_kw = dict(stripe=stripe, anchor=anchor, nS=1, horizontal=True,
                  has_bands=has_bands, mm=mm, out_dtype=out_dtype)

    @jax.custom_vjp
    def f(*args):
        return _stripe_half_large_call(args, interpret=interpret, **kw)

    def fwd(*args):
        return _stripe_half_large_call(args, interpret=interpret, **kw), args

    def bwd(res, g):
        _, pullback = jax.vjp(
            lambda *a: _stripe_half_ref_xla(a, **ref_kw), *res)
        return pullback(g)

    f.defvjp(fwd, bwd)
    return f

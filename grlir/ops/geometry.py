"""Static attention geometry: relative-coordinate tables, position indices, shift masks.

Everything in this module is a *pure numpy function of static shapes*.  On TPU the
tables/indices/masks are compile-time constants of the traced program: we precompute
them on host once per (padded resolution, window, stripe, anchor-down-factor)
configuration and feed them to the jitted forward.  Nothing here ever runs on device
per step (the reference recomputes these buffers on the fly when the input resolution
changes, /root/reference/models/networks/grl.py:431-453 — here that becomes a host-side
cache keyed by padded shape).

Semantics match the reference builders bit-for-bit so released checkpoints evaluate
identically:
  - stripe geometry:            /root/reference/models/common/mixed_attn_block_efficient.py:61-70
  - coords tables:              /root/reference/models/common/ops.py:225-271
  - position indices:           /root/reference/models/common/ops.py:308-375
  - shift masks:                /root/reference/models/common/ops.py:76-157
"""

from __future__ import annotations

from dataclasses import dataclass
from math import prod
from typing import Optional, Sequence, Tuple

import numpy as np

Size2 = Tuple[int, int]

MASK_NEG = -100.0


def get_stripe_info(
    stripe_size_in: Sequence[Optional[int]],
    stripe_groups_in: Sequence[Optional[int]],
    stripe_shift: bool,
    input_resolution: Size2,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Resolve per-axis stripe size and shift.

    A ``None`` group means a fixed stripe extent on that axis; otherwise the stripe
    spans ``resolution // groups`` (resolution-dependent — the reason geometry is
    keyed by padded input shape).
    """
    stripe_size, shift_size = [], []
    for s, g, d in zip(stripe_size_in, stripe_groups_in, input_resolution):
        if g is None:
            stripe_size.append(s)
            shift_size.append(s // 2 if stripe_shift else 0)
        else:
            stripe_size.append(d // g)
            shift_size.append(0 if g == 1 else d // (g * 2))
    return tuple(stripe_size), tuple(shift_size)


def _region_id_1d(length: int, window: int, shift: int) -> np.ndarray:
    """Region ids along one axis for the shifted-window mask.

    Coordinates fall into three bands: the bulk [0, L-window), the band that wraps
    partially [L-window, L-shift), and the fully wrapped band [L-shift, L).
    """
    ids = np.zeros(length, dtype=np.int64)
    ids[length - window:] = 1
    if shift > 0:
        ids[length - shift:] = 2
    else:
        # slice(-shift, None) with shift == 0 covers the whole axis in the
        # reference's _fill_window, so band 2 wins everywhere.
        ids[:] = 2
    return ids


def fill_window(
    input_resolution: Size2,
    window_size: Size2,
    shift_size: Optional[Size2] = None,
) -> np.ndarray:
    """Per-window flattened region-id map, shape (num_windows, prod(window_size)).

    Mirrors the slice-assignment construction of the reference's ``_fill_window``
    (ops.py:76-100) via an equivalent closed form: the region id of a pixel is
    3 * band(h) + band(w).
    """
    if shift_size is None:
        shift_size = tuple(s // 2 for s in window_size)
    H, W = input_resolution
    ids = (
        3 * _region_id_1d(H, window_size[0], shift_size[0])[:, None]
        + _region_id_1d(W, window_size[1], shift_size[1])[None, :]
    )
    # window partition: (H, W) -> (nH, wh, nW, ww) -> (nH*nW, wh*ww)
    nH, nW = H // window_size[0], W // window_size[1]
    ids = ids.reshape(nH, window_size[0], nW, window_size[1])
    ids = ids.transpose(0, 2, 1, 3).reshape(nH * nW, prod(window_size))
    return ids


def calculate_mask(
    input_resolution: Size2, window_size: Size2, shift_size
) -> np.ndarray:
    """Swin shifted-window attention mask, (nW, N, N) float32 in {0, -100}."""
    if isinstance(shift_size, int):
        shift_size = (shift_size, shift_size)
    m = fill_window(input_resolution, window_size, shift_size)
    attn_mask = m[:, None, :] - m[:, :, None]  # (nW, N, N): query axis 1, key axis 2
    # reference: mask_windows.unsqueeze(1) - mask_windows.unsqueeze(2) gives
    # [w, key, query]? No — unsqueeze(1) broadcasts over axis1 (queries), so
    # element [w, i, j] = m[w, j] - m[w, i].  Sign is irrelevant for the !=0 test.
    return np.where(attn_mask != 0, MASK_NEG, 0.0).astype(np.float32)


def calculate_mask_all(
    input_resolution: Size2,
    window_size: Size2,
    shift_size: Size2,
    anchor_window_down_factor: int = 1,
    window_to_anchor: bool = True,
) -> np.ndarray:
    """Window<->anchor shifted attention mask, (nW, N1, N2) float32 in {0, -100}."""
    df = anchor_window_down_factor
    anchor_resolution = tuple(s // df for s in input_resolution)
    aws = tuple(s // df for s in window_size)
    anchor_shift = tuple(s // df for s in shift_size)

    mask_windows = fill_window(input_resolution, window_size, shift_size)
    mask_anchor = fill_window(anchor_resolution, aws, anchor_shift)

    if window_to_anchor:
        diff = mask_windows[:, :, None] - mask_anchor[:, None, :]
    else:
        diff = mask_anchor[:, :, None] - mask_windows[:, None, :]
    return np.where(diff != 0, MASK_NEG, 0.0).astype(np.float32)


def get_relative_coords_table(
    window_size: Size2,
    pretrained_window_size: Size2 = (0, 0),
    anchor_window_down_factor: int = 1,
) -> np.ndarray:
    """Log-scaled relative-coordinate table, (1, Th, Tw, 2) float32.

    Th = wh + awh - 1, Tw = ww + aww - 1 where aw* = w* // down_factor.  The table
    extent is asymmetric for df > 1 (ops.py:246-250): positive side reaches
    w-1-(w-aw)//2, negative side reaches -(aw-1)-(w-aw)//2.
    """
    ws = window_size
    aws = [w // anchor_window_down_factor for w in window_size]
    pws = pretrained_window_size
    paws = [w // anchor_window_down_factor for w in pretrained_window_size]

    ts_p = [w1 - 1 - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    ts_n = [-(w2 - 1) - (w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    pts = [w1 - 1 - (w1 - w2) // 2 for w1, w2 in zip(pws, paws)]

    coord_h = np.arange(ts_n[0], ts_p[0] + 1, dtype=np.float64)
    coord_w = np.arange(ts_n[1], ts_p[1] + 1, dtype=np.float64)
    table = np.stack(np.meshgrid(coord_h, coord_w, indexing="ij"), axis=-1)[None]
    denom = [pts[0], pts[1]] if pts[0] > 0 else [ts_p[0], ts_p[1]]
    table[..., 0] /= denom[0]
    table[..., 1] /= denom[1]
    table *= 8  # normalize to [-8, 8]
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.astype(np.float32)


def _meshgrid_coords(start: Size2, end: Size2) -> np.ndarray:
    ch = np.arange(start[0], end[0])
    cw = np.arange(start[1], end[1])
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"))  # 2, Wh, Ww
    return coords.reshape(2, -1)


def _coords_diff_odd(c1, c2, start_coord, max_diff) -> np.ndarray:
    coords = c1[:, :, None] - c2[:, None, :]  # 2, N1, N2
    coords = coords.transpose(1, 2, 0).copy()
    coords[:, :, 0] += start_coord[0]
    coords[:, :, 1] += start_coord[1]
    coords[:, :, 0] *= max_diff
    return coords.sum(-1)


def get_relative_position_index(
    window_size: Size2,
    anchor_window_down_factor: int = 1,
    window_to_anchor: bool = True,
) -> np.ndarray:
    """Flat table indices for each (window token, anchor token) pair, int32.

    Matches the reference's "simple" builder (ops.py:352-375): both grids start at
    (0, 0); the offset constants place indices in [0, Th*Tw).  Shape is
    (N_window, N_anchor) when window_to_anchor else transposed.
    """
    ws = window_size
    aws = [w // anchor_window_down_factor for w in window_size]

    coords = _meshgrid_coords((0, 0), ws)
    coords_anchor = _meshgrid_coords((0, 0), aws)

    max_horizontal_diff = aws[1] + ws[1] - 1
    if window_to_anchor:
        offset = [w2 - 1 for w2 in aws]
        idx = _coords_diff_odd(coords, coords_anchor, offset, max_horizontal_diff)
    else:
        offset = [w1 - 1 for w1 in ws]
        idx = _coords_diff_odd(coords_anchor, coords, offset, max_horizontal_diff)
    return idx.astype(np.int32)


def get_bias_factors(
    window_size: Size2,
    anchor_window_down_factor: int = 1,
    window_to_anchor: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-hot factor matrices (Py, Px) of the relative-position index.

    The flat index of get_relative_position_index is 2D-separable:
    ``index[(y1,x1),(y2,x2)] = ry[y1,y2] * Tw + rx[x1,x2]`` — so the
    (N1, N2) bias matrix is a 2D block-Toeplitz arrangement of the small
    (Th, Tw) table and can be built with two tiny one-hot MATMULS instead
    of an N1*N2-element gather.  On TPU the gather is the whole ballgame:
    a 4M-element gather costs ~9 ms however laid out (measured, all four
    gather strategies), i.e. ~800 ms of a GRL-base window-32 tile, while
    the two matmuls are ~100x cheaper and run on the MXU.

    Returns Py (Y1, Y2, Th) and Px (X1, X2, Tw) float32 one-hot arrays with
    ``Py[y1,y2,ry]*Px[x1,x2,rx]`` selecting table entry (ry, rx).
    """
    ws = window_size
    aws = [w // anchor_window_down_factor for w in window_size]
    if window_to_anchor:
        (h1, w1), (h2, w2) = ws, aws
        off = [w - 1 for w in aws]
    else:
        (h1, w1), (h2, w2) = aws, ws
        off = [w - 1 for w in ws]
    th = ws[0] + aws[0] - 1
    tw = ws[1] + aws[1] - 1

    ry = np.arange(h1)[:, None] - np.arange(h2)[None, :] + off[0]
    rx = np.arange(w1)[:, None] - np.arange(w2)[None, :] + off[1]
    py = np.zeros((h1, h2, th), np.float32)
    px = np.zeros((w1, w2, tw), np.float32)
    np.put_along_axis(py, ry[..., None], 1.0, axis=-1)
    np.put_along_axis(px, rx[..., None], 1.0, axis=-1)
    return py, px


def get_relative_position_index_centered(
    window_size: Size2,
    anchor_window_down_factor: int = 1,
    window_to_anchor: bool = True,
) -> np.ndarray:
    """The "all" variant (ops.py:319-349): anchor grid centered inside the window.

    Kept for the property test mirroring the reference's own self-check
    (ops.py:472-551): centered and simple builders must agree.
    """
    ws = window_size
    aws = [w // anchor_window_down_factor for w in window_size]
    start = [(w1 - w2) // 2 for w1, w2 in zip(ws, aws)]
    end = [s + w2 for s, w2 in zip(start, aws)]

    coords = _meshgrid_coords((0, 0), ws)
    coords_anchor = _meshgrid_coords(start, end)

    max_horizontal_diff = aws[1] + ws[1] - 1
    if window_to_anchor:
        offset = [w2 + s - 1 for s, w2 in zip(start, aws)]
        idx = _coords_diff_odd(coords, coords_anchor, offset, max_horizontal_diff)
    else:
        offset = [w1 - s - 1 for s, w1 in zip(start, ws)]
        idx = _coords_diff_odd(coords_anchor, coords, offset, max_horizontal_diff)
    return idx.astype(np.int32)


@dataclass(frozen=True)
class GeometryConfig:
    """Static attention-geometry hyperparameters of a GRL network."""

    window_size: Size2
    stripe_size: Tuple[Optional[int], Optional[int]]
    stripe_groups: Tuple[Optional[int], Optional[int]]
    anchor_window_down_factor: int = 1
    pretrained_window_size: Size2 = (0, 0)
    pretrained_stripe_size: Size2 = (0, 0)

    @property
    def pad_size(self) -> int:
        """Spatial sizes must be multiples of this (grl.py:273-276)."""
        max_ss = max(0 if s is None else s for s in self.stripe_size)
        max_sg = max(0 if g is None else g for g in self.stripe_groups)
        max_sg *= self.anchor_window_down_factor
        return max(self.window_size[0], self.window_size[1], max_ss, max_sg)


def bias_factor_entries(w: Size2, ss: Size2, sv: Size2, df: int) -> dict:
    """Per-geometry one-hot bias factors (see get_bias_factors), flat keys."""
    out = {}
    for py, px, key in [
        (*get_bias_factors(w), "bfac_w"),
        (*get_bias_factors(ss, df, False), "bfac_sh_a2w"),
        (*get_bias_factors(ss, df, True), "bfac_sh_w2a"),
        (*get_bias_factors(sv, df, False), "bfac_sv_a2w"),
        (*get_bias_factors(sv, df, True), "bfac_sv_w2a"),
    ]:
        out[f"{key}_y"] = py
        out[f"{key}_x"] = px
    return out


def build_geometry_compact(cfg: GeometryConfig, x_size: Size2) -> dict:
    """Tables, indices and *factorized* shift masks for one padded resolution.

    The (nW, N1, N2) shift masks are rank-1 factorizable: mask[w, i, j] is
    MASK_NEG iff band[w, i] != band[w, j], where the band maps come from
    ``fill_window``.  Embedding the full masks as compile-time constants
    explodes the serialized program (window 32 at 256² is a 268 MB constant —
    the remote TPU compile service rejects the payload), so the model embeds
    only the (nW, N) band maps and inflates the masks on device, once per
    forward.  See build_geometry for the dense variant used by tests.
    """
    ss, sss = get_stripe_info(cfg.stripe_size, cfg.stripe_groups, True, x_size)
    sv, svs = get_stripe_info(
        cfg.stripe_size[::-1], cfg.stripe_groups[::-1], True, x_size
    )
    df = cfg.anchor_window_down_factor
    w = cfg.window_size
    shift = tuple(s // 2 for s in w)

    def bands(res, win, sh):
        return fill_window(res, win, sh).astype(np.int32)

    a_res = tuple(s // df for s in x_size)
    return {
        "table_w": get_relative_coords_table(w, cfg.pretrained_window_size),
        "table_sh": get_relative_coords_table(ss, cfg.pretrained_stripe_size, df),
        "table_sv": get_relative_coords_table(sv, cfg.pretrained_stripe_size, df),
        "index_w": get_relative_position_index(w),
        "index_sh_a2w": get_relative_position_index(ss, df, False),
        "index_sh_w2a": get_relative_position_index(ss, df, True),
        "index_sv_a2w": get_relative_position_index(sv, df, False),
        "index_sv_w2a": get_relative_position_index(sv, df, True),
        **bias_factor_entries(w, ss, sv, df),
        "bands_w": bands(x_size, w, shift),
        "bands_sh": bands(x_size, ss, sss),
        "bands_sh_a": bands(a_res, tuple(s // df for s in ss),
                            tuple(s // df for s in sss)),
        "bands_sv": bands(x_size, sv, svs),
        "bands_sv_a": bands(a_res, tuple(s // df for s in sv),
                            tuple(s // df for s in svs)),
    }


def build_geometry(cfg: GeometryConfig, x_size: Size2) -> dict:
    """All tables/indices/masks for one padded resolution.

    Returns the 13-entry dict consumed by the model: window table/index/mask plus
    horizontal ('sh') and vertical ('sv') stripe variants with anchor<->window
    ('a2w'/'w2a') index and mask pairs (grl.py:386-429).

    Deliberate improvement over the reference: the reference derives the vertical
    variant from the *reversed horizontal* stripe size (grl.py:399-414), which is
    only correct for square inputs — it actually crashes on non-square padded
    shapes with the deployed grouped-stripe configs (verified against the live
    torch model), forcing square-tile eval.  We compute the vertical stripe from
    the true resolution instead; for square inputs the two definitions coincide
    exactly, so checkpoint parity is unaffected.
    """
    ss, sss = get_stripe_info(cfg.stripe_size, cfg.stripe_groups, True, x_size)
    sv, svs = get_stripe_info(
        cfg.stripe_size[::-1], cfg.stripe_groups[::-1], True, x_size
    )
    df = cfg.anchor_window_down_factor
    w = cfg.window_size
    shift = tuple(s // 2 for s in w)

    return {
        "table_w": get_relative_coords_table(w, cfg.pretrained_window_size),
        "table_sh": get_relative_coords_table(ss, cfg.pretrained_stripe_size, df),
        "table_sv": get_relative_coords_table(sv, cfg.pretrained_stripe_size, df),
        "index_w": get_relative_position_index(w),
        "index_sh_a2w": get_relative_position_index(ss, df, False),
        "index_sh_w2a": get_relative_position_index(ss, df, True),
        "index_sv_a2w": get_relative_position_index(sv, df, False),
        "index_sv_w2a": get_relative_position_index(sv, df, True),
        **bias_factor_entries(w, ss, sv, df),
        "mask_w": calculate_mask(x_size, w, shift),
        "mask_sh_a2w": calculate_mask_all(x_size, ss, sss, df, False),
        "mask_sh_w2a": calculate_mask_all(x_size, ss, sss, df, True),
        "mask_sv_a2w": calculate_mask_all(x_size, sv, svs, df, False),
        "mask_sv_w2a": calculate_mask_all(x_size, sv, svs, df, True),
    }

"""Whole-image and overlap-tile inference.

The reference's forward_tile (engines/base.py:90-116) runs the net per tile in a
Python loop.  TPU-native version: all tiles share one static shape, so there is
exactly ONE compiled program; tiles are stacked and run in fixed-size groups to
keep the MXU fed, then overlap-averaged (E/W accumulation) on host.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reflect_pad_to(img: np.ndarray, target_hw: Tuple[int, int]) -> np.ndarray:
    """Pad (..., H, W, C) to target (H', W') bottom/right with reflect
    (edge when a pad exceeds the image — numpy reflect limit).

    INVARIANT: images must be padded to their canonical shape in ONE reflect.
    GRL's stripe attention is global over the padded canvas, so chained pads
    (e.g. member->batch-max then batch->bucket) change the restored output
    everywhere, not just at borders.
    """
    h, w = img.shape[-3], img.shape[-2]
    ph, pw = target_hw[0] - h, target_hw[1] - w
    if ph == 0 and pw == 0:
        return img
    assert ph >= 0 and pw >= 0, (img.shape, target_hw)
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    mode = "reflect" if (ph < h and pw < w) else "edge"
    return np.pad(img, pad, mode=mode)


class Restorer:
    """Callable wrapper around a jitted model apply with tiling support.

    apply_fn(params, lq) -> restored, both NHWC.  `tile=0` runs whole images
    (compiled per padded shape, cached by XLA's jit cache).
    """

    def __init__(
        self,
        apply_fn: Callable,
        params,
        scale: int = 1,
        tile: int = 0,
        tile_overlap: int = 0,
        tile_batch: int = 1,
        mesh=None,
        shape_bucket: int = 0,
    ):
        """mesh: optional jax.sharding.Mesh — tiles are then sharded over the
        `data` axis so a multi-chip slice restores one large image in parallel
        (the spatial analogue of sequence parallelism, SURVEY.md §2.7).

        shape_bucket: whole-image mode pads H/W up to the next multiple of
        this (reflect) and crops the output, so a val set of assorted sizes
        compiles O(1) programs instead of one per distinct shape
        (SURVEY.md §7 padded-shape discipline; XLA compiles per static shape)."""
        if mesh is not None:
            from grlir.parallel.mesh import batch_sharding, replicated

            n_dev = mesh.devices.size
            tile_batch = max(tile_batch, n_dev)
            self.apply_fn = jax.jit(
                apply_fn,
                in_shardings=(replicated(mesh), batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh),
            )
        else:
            self.apply_fn = jax.jit(apply_fn)
        self.params = params
        self.scale = scale
        self.tile = tile
        self.tile_overlap = tile_overlap
        self.tile_batch = tile_batch
        self.shape_bucket = shape_bucket

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: (B, H, W, C) float32 in [0,1] -> (B, H*scale, W*scale, C_out)."""
        if self.tile == 0:
            if self.shape_bucket:
                return self._forward_bucketed(img)
            return np.asarray(self.apply_fn(self.params, jnp.asarray(img)))
        return self.forward_tile(img)

    def _forward_bucketed(self, img: np.ndarray) -> np.ndarray:
        b, h, w, _ = img.shape
        m = self.shape_bucket
        img = reflect_pad_to(img, (h + (-h % m), w + (-w % m)))
        out = np.asarray(self.apply_fn(self.params, jnp.asarray(img)))
        sf = self.scale
        return out[:, : h * sf, : w * sf]

    def forward_tile(self, img: np.ndarray) -> np.ndarray:
        b, h, w, _ = img.shape
        sf = self.scale
        tile = min(self.tile, h, w)
        stride = tile - self.tile_overlap
        h_idx = list(range(0, h - tile, stride)) + [h - tile]
        w_idx = list(range(0, w - tile, stride)) + [w - tile]
        positions = [(hi, wi) for hi in h_idx for wi in w_idx]

        # gather all tiles -> (P*b, tile, tile, C): one static shape, one program
        patches = np.stack(
            [img[i, hi: hi + tile, wi: wi + tile] for hi, wi in positions
             for i in range(b)]
        )
        n = patches.shape[0]
        group = max(self.tile_batch, 1)
        outs = []
        for s in range(0, n, group):
            chunk = patches[s: s + group]
            pad = group - chunk.shape[0]
            if pad:
                zeros = np.zeros((pad, *chunk.shape[1:]), chunk.dtype)
                chunk = np.concatenate([chunk, zeros], 0)
            y = np.asarray(self.apply_fn(self.params, jnp.asarray(chunk)))
            outs.append(y[: group - pad] if pad else y)
        out_patches = np.concatenate(outs, 0)

        out_c = out_patches.shape[-1]
        E = np.zeros((b, h * sf, w * sf, out_c), np.float32)
        W = np.zeros_like(E)
        k = 0
        for hi, wi in positions:
            for i in range(b):
                E[i, hi * sf: (hi + tile) * sf, wi * sf: (wi + tile) * sf] += \
                    out_patches[k]
                W[i, hi * sf: (hi + tile) * sf, wi * sf: (wi + tile) * sf] += 1.0
                k += 1
        return E / W

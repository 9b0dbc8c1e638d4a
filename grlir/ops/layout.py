"""Layout transforms for NHWC feature maps.

The network keeps features in NHWC (TPU-native conv layout).  Window partitioning
keeps the batch dimension separate — windows become an explicit axis instead of
being folded into batch (the reference folds them, mixed_attn_block_efficient.py:146),
which lets XLA batch the per-window attention einsums cleanly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Size2 = Tuple[int, int]


def window_partition(x: jnp.ndarray, window_size: Size2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nWin, wh*ww, C) in row-major window order."""
    B, H, W, C = x.shape
    wh, ww = window_size
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // wh) * (W // ww), wh * ww, C)


def window_reverse(x: jnp.ndarray, window_size: Size2, x_size: Size2) -> jnp.ndarray:
    """(B, nWin, wh*ww, C) -> (B, H, W, C)."""
    H, W = x_size
    wh, ww = window_size
    B = x.shape[0]
    C = x.shape[-1]
    x = x.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def window_partition_cm(x: jnp.ndarray, window_size: Size2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nWin, C, wh*ww): windowed AND channel-major in ONE
    transpose copy.

    The "fused-boundary" attention path (attn_io="cm") consumes channel-major
    window blocks so the qkv dense can be computed as einsum('kc,bwcn->bwkn')
    with the token axis staying minor throughout — the separate
    partition-then-swapaxes pair of full-tensor copies of the legacy path
    collapses into this single copy."""
    B, H, W, C = x.shape
    wh, ww = window_size
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, nH, nW, C, wh, ww)
    return x.reshape(B, (H // wh) * (W // ww), C, wh * ww)


def window_reverse_cm(x: jnp.ndarray, window_size: Size2,
                      x_size: Size2) -> jnp.ndarray:
    """(B, nWin, C, wh*ww) -> (B, H, W, C): inverse of window_partition_cm,
    also a single transpose copy."""
    H, W = x_size
    wh, ww = window_size
    B, _, C, _ = x.shape
    x = x.reshape(B, H // wh, W // ww, C, wh, ww)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, nH, wh, nW, ww, C)
    return x.reshape(B, H, W, C)


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel semantics.

    Input channel index c*scale^2 + i*scale + j maps to output channel c at spatial
    offset (i, j) — matches torch.nn.PixelShuffle so converted conv weights behave
    identically.
    """
    B, H, W, C = x.shape
    r = scale
    oc = C // (r * r)
    x = x.reshape(B, H, W, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, oc
    return x.reshape(B, H * r, W * r, oc)


def pixel_shuffle_jic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Reshape-only pixel shuffle for (j, i, c)-ordered channels.

    Expects input channel index j*(r*oc) + i*oc + c (instead of torch's
    c*r^2 + i*r + j); the producing conv's weights are permuted accordingly
    (see shuffle_channel_perm).  Equivalent output to pixel_shuffle, but the
    interleaves are pure row-major reshapes + two clean transposes — the
    torch-order implementation materializes a 6D intermediate with trailing
    (r, r) dims that pad to the (16, 128) TPU tile (a 4.8 GB copy at 384²
    x4; measured as the single largest layout op in the compiled forward).
    """
    B, H, W, C = x.shape
    r = scale
    oc = C // (r * r)
    x = x.reshape(B, H, W * r, r * oc)   # (w, j*(r*oc)+t) -> (w*r+j, t)
    x = x.transpose(0, 2, 1, 3)          # (B, W*r, H, r*oc)
    x = x.reshape(B, W * r, H * r, oc)   # (h, i*oc+c) -> (h*r+i, c)
    return x.transpose(0, 2, 1, 3)       # (B, H*r, W*r, oc)


def shuffle_channel_perm(out_channels: int, scale: int):
    """old-channel index for each new (j, i, c)-ordered channel.

    new = j*(r*oc) + i*oc + c  holds torch channel  old = c*r^2 + i*r + j.
    Apply to the producing conv's kernel/bias out axis: kp = k[..., perm].
    """
    import numpy as np

    r, oc = scale, out_channels
    perm = np.empty(r * r * oc, np.int32)
    for j in range(r):
        for i in range(r):
            for c in range(oc):
                perm[j * r * oc + i * oc + c] = c * r * r + i * r + j
    return perm


def nearest_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC nearest-neighbour upsampling (torch F.interpolate mode='nearest')."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, scale, W, scale, C))
    return x.reshape(B, H * scale, W * scale, C)


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Reflect-pad H and W (bottom/right) to the next multiple (grl.py:479-489).

    Falls back to zero padding when the image is smaller than the pad amount, like
    the reference's try/except.
    """
    B, H, W, C = x.shape
    ph = (multiple - H % multiple) % multiple
    pw = (multiple - W % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    mode = "reflect" if (ph < H and pw < W) else "constant"
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)

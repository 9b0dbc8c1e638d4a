"""Classification-mode image <-> probability converters.

The reference's experimental classification training mode treats each 8-bit
pixel value as a 256-way class (utils/utils_image.py:333-366, engines/base.py
compute_loss classification branch + form_images prob_to_image).  NHWC here:
probability tensors are (B, H, W, C, 256) with classes on the last axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def img_to_prob(image, sigma: float = 5.0, data_range: float = 1.0):
    """(B,H,W,C) in [0,1] -> (B,H,W,C,256) soft one-hot around the 8-bit value."""
    if data_range == 1:
        image = image * 255.0
    classes = jnp.arange(256, dtype=image.dtype)
    diff = classes - image[..., None]
    prob = (1.0 / math.sqrt(2 * math.pi) / sigma
            * jnp.exp(-0.5 * (diff / sigma) ** 2))
    return prob / jnp.sum(prob, axis=-1, keepdims=True)


def img_to_class(image, data_range: float = 1.0):
    """(B,H,W,C) -> int class indices (truncation like torch .to(long))."""
    if data_range == 1:
        image = image * 255.0
    return image.astype(jnp.int32)


def img_from_prob_argmax(class_dist):
    """(B,H,W,C,256) -> (B,H,W,C) via argmax."""
    return jnp.argmax(class_dist, axis=-1).astype(jnp.float32) / 255.0


def img_from_prob_weighted(class_dist):
    """(B,H,W,C,256) -> (B,H,W,C) via expectation."""
    value = jnp.arange(256, dtype=class_dist.dtype) / 255.0
    return jnp.sum(class_dist * value, axis=-1)


def cross_entropy_pixel_loss(logits, target_img, data_range: float = 1.0):
    """CE over per-pixel 256-way logits against the 8-bit target class
    (engines/base.py classification loss path)."""
    labels = img_to_class(target_img, data_range)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

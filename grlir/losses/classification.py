"""Classification-mode training losses.

The reference's experimental classification mode treats each 8-bit pixel value
as a 256-way class: the model emits per-pixel logits, pixel losses are applied
to the expected image under the softmax distribution, and a cross-entropy term
supervises the distribution itself (engines/base.py:184-204 classification
branch, utils/utils_image.py:333-366 converters).

grlir layout: the model emits (B, H, W, C*256) logits; helpers reshape to
(B, H, W, C, 256) with classes on the last axis.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from grlir.utils.classification import (
    cross_entropy_pixel_loss,
    img_from_prob_argmax,
    img_from_prob_weighted,
    img_to_prob,
)


def logits_to_class_dist(logits):
    """(B, H, W, C*256) -> (B, H, W, C, 256) softmax distribution."""
    B, H, W, CK = logits.shape
    assert CK % 256 == 0, f"classification head needs C*256 channels, got {CK}"
    x = logits.reshape(B, H, W, CK // 256, 256)
    return jax.nn.softmax(x, axis=-1)


def soft_cross_entropy_pixel_loss(logits, target_img, data_range: float = 1.0):
    """CE against the soft (gaussian-smoothed) target distribution — the
    reference's `one_hot_label: False` path (img_to_prob target)."""
    target_prob = img_to_prob(target_img, data_range=data_range)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_prob * logp, axis=-1))


def build_classification_loss(
    loss_cfg: Mapping[str, float],
    pixel_losses: Mapping[str, Callable],
    one_hot_label: bool = True,
    prob_to_image: str = "weighted_sum",
) -> Callable:
    """(logits, target_img) -> (total, parts).  Mirrors compute_loss's
    classification branch: l1/l2 on the expected image, cross_entropy on the
    per-pixel distribution (engines/base.py:186-199)."""
    form = (img_from_prob_argmax if prob_to_image == "argmax"
            else img_from_prob_weighted)

    def loss_fn(logits, target_img):
        B, H, W, CK = logits.shape
        raw = logits.reshape(B, H, W, CK // 256, 256)
        dist = jax.nn.softmax(raw, axis=-1)
        total = 0.0
        parts: Dict[str, jnp.ndarray] = {}
        for name, weight in loss_cfg.items():
            if name == "cross_entropy":
                if one_hot_label:
                    v = cross_entropy_pixel_loss(raw, target_img)
                else:
                    v = soft_cross_entropy_pixel_loss(raw, target_img)
            elif name in pixel_losses:
                v = pixel_losses[name](form(dist), target_img)
            else:
                raise NotImplementedError(
                    f"loss {name!r} not supported in classification mode "
                    f"(reference engines/base.py:196-199)"
                )
            parts[name] = v
            total = total + weight * v
        return total, parts

    return loss_fn

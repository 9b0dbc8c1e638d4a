"""VGG19 feature extractor for perceptual loss (flax, NHWC).

Equivalent of /root/reference/models/aux_archs/vgg.py:154-268: truncated VGG
features with named-layer dict output and ImageNet input normalization.
Pretrained torchvision weights are loaded via `convert_vgg_torch_weights`
(torchvision's `vgg19-dcbb9e9d.pth`, user-supplied — no network egress here).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# layer-name sequence of vgg19 features (vgg.py:94-130)
VGG19_NAMES = [
    "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
    "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
    "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
    "conv3_4", "relu3_4", "pool3",
    "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
    "conv4_4", "relu4_4", "pool4",
    "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
    "conv5_4", "relu5_4", "pool5",
]

_VGG19_CHANNELS = {
    "conv1": 64, "conv2": 128, "conv3": 256, "conv4": 512, "conv5": 512,
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGGFeatureExtractor(nn.Module):
    """Truncated VGG19 returning {layer_name: features} (NHWC)."""

    layer_name_list: Tuple[str, ...]
    use_input_norm: bool = True
    range_norm: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std

        max_idx = max(VGG19_NAMES.index(v) for v in self.layer_name_list)
        out = {}
        for name in VGG19_NAMES[: max_idx + 1]:
            if name.startswith("conv"):
                ch = _VGG19_CHANNELS[name.split("_")[0]]
                x = nn.Conv(ch, (3, 3), padding=1, name=name)(x)
            elif name.startswith("relu"):
                x = nn.relu(x)
            elif name.startswith("pool"):
                if self.remove_pooling:
                    continue
                x = nn.max_pool(x, (2, 2),
                                strides=(self.pooling_stride,) * 2)
            if name in self.layer_name_list:
                out[name] = x
        return out


def convert_vgg_torch_weights(torch_state_dict, layer_name_list) -> dict:
    """torchvision vgg19 features.* state_dict -> flax params for this module."""
    # torchvision indexes: features.{i}.weight in the same order as VGG19_NAMES
    conv_indices = [i for i, n in enumerate(VGG19_NAMES) if n.startswith("conv")]
    params = {}
    for seq_idx, name in zip(conv_indices, (n for n in VGG19_NAMES
                                            if n.startswith("conv"))):
        w = np.asarray(torch_state_dict[f"features.{seq_idx}.weight"])
        b = np.asarray(torch_state_dict[f"features.{seq_idx}.bias"])
        params[name] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


def perceptual_loss(
    vgg_apply,
    pred,
    target,
    layer_weights: Dict[str, float],
    criterion: str = "l1",
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
):
    """Layer-weighted VGG feature loss (+ optional Gram style loss)
    (losses/losses.py:59-187)."""
    feats_p = vgg_apply(pred)
    feats_t = jax.lax.stop_gradient(vgg_apply(target))

    def crit(a, b):
        if criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if criterion in ("l2", "mse"):
            return jnp.mean((a - b) ** 2)
        if criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise ValueError(criterion)

    percep = 0.0
    if perceptual_weight > 0:
        for k, w in layer_weights.items():
            percep = percep + w * crit(feats_p[k], feats_t[k])
        percep = percep * perceptual_weight

    style = 0.0
    if style_weight > 0:
        def gram(f):
            B, H, W, C = f.shape
            m = f.reshape(B, H * W, C)
            return jnp.einsum("bnc,bnd->bcd", m, m) / (H * W * C)

        for k, w in layer_weights.items():
            style = style + w * crit(gram(feats_p[k]), gram(feats_t[k]))
        style = style * style_weight

    return percep, style

"""LPIPS perceptual metric (VGG backbone) with official-weight conversion.

The reference wraps the `lpips` pip package (utils/metrics/lpips.py:11-50).
Here LPIPS is implemented natively on the existing flax VGG16 features:
unit-normalize each tap, squared difference, 1x1 learned linear calibration,
spatial average, sum over taps (Zhang et al. 2018).  The learned calibration
weights come from the official release via `convert_lpips_torch_weights`
(user-supplied .pth; no network egress in this environment).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# LPIPS VGG16 backbone taps (relu1_2 .. relu5_3) and channel widths
VGG16_NAMES = [
    "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
    "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
    "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3", "pool3",
    "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3", "pool4",
    "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3", "pool5",
]
_CH = {"conv1": 64, "conv2": 128, "conv3": 256, "conv4": 512, "conv5": 512}
LPIPS_TAPS = ["relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"]
LPIPS_TAP_CH = [64, 128, 256, 512, 512]

# official input scaling (lpips scaling_layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSVgg(nn.Module):
    """LPIPS distance; input NHWC in [0,1] (converted to [-1,1] internally)."""

    @nn.compact
    def __call__(self, x, y):
        # run both images through the shared backbone in one batch (submodules
        # are created once)
        v = jnp.concatenate([x, y], axis=0)
        v = 2.0 * v - 1.0  # [0,1] -> [-1,1] like the reference wrapper
        v = (v - _SHIFT) / _SCALE
        taps = {}
        h = v
        for name in VGG16_NAMES:
            if name.startswith("conv"):
                h = nn.Conv(_CH[name.split("_")[0]], (3, 3), padding=1,
                            name=name)(h)
            elif name.startswith("relu"):
                h = nn.relu(h)
            else:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if name in LPIPS_TAPS:
                taps[name] = h
                if name == LPIPS_TAPS[-1]:
                    break

        B = x.shape[0]
        fx = {k: v[:B] for k, v in taps.items()}
        fy = {k: v[B:] for k, v in taps.items()}
        total = 0.0
        for i, tap in enumerate(LPIPS_TAPS):
            a = _unit_normalize(fx[tap])
            b = _unit_normalize(fy[tap])
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (LPIPS_TAP_CH[i],))
            # official lins are 1x1 convs with non-negative weights
            d = jnp.sum(d * jnp.maximum(w, 0.0), axis=-1, keepdims=True)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (n + eps)


def convert_lpips_torch_weights(lpips_state_dict, vgg_features_state_dict):
    """Build the flax param tree from the official LPIPS .pth (lin layers) and
    a torchvision vgg16 features state_dict (backbone)."""
    params: Dict[str, dict] = {}
    conv_indices = [i for i, n in enumerate(VGG16_NAMES) if n.startswith("conv")]
    for seq_idx, name in zip(conv_indices,
                             (n for n in VGG16_NAMES if n.startswith("conv"))):
        w = np.asarray(vgg_features_state_dict[f"features.{seq_idx}.weight"])
        b = np.asarray(vgg_features_state_dict[f"features.{seq_idx}.bias"])
        params[name] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    for i in range(len(LPIPS_TAPS)):
        key = f"lins.{i}.model.1.weight"
        if key not in lpips_state_dict:
            key = f"lin{i}.model.1.weight"
        w = np.asarray(lpips_state_dict[key])  # (1, C, 1, 1)
        params[f"lin{i}"] = w.reshape(-1)
    return {"params": params}


def lpips_batch(apply_fn, params, pred, target) -> np.ndarray:
    """Per-image LPIPS over NHWC batches in [0,1]."""
    return np.asarray(apply_fn(params, jnp.asarray(pred), jnp.asarray(target)))


def save_lpips_params(params, path: str):
    """Persist converted LPIPS params as an npz with '/'-joined keys."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    np.savez(path, **flat)


def load_lpips_params(path: str):
    """Inverse of save_lpips_params."""
    out: Dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


_LPIPS_STATE = None


def lpips_metric(pred, target) -> np.ndarray:
    """(B,H,W,3) x2 -> (B,) LPIPS.  Loads calibration+VGG weights once from
    $GRLIR_LPIPS_NPZ (produced by save_lpips_params after
    convert_lpips_torch_weights); raises a clear error when absent."""
    global _LPIPS_STATE
    if _LPIPS_STATE is None:
        import os

        path = os.environ.get("GRLIR_LPIPS_NPZ", "")
        if not path or not os.path.exists(os.path.expanduser(path)):
            raise RuntimeError(
                "LPIPS requested but $GRLIR_LPIPS_NPZ is not set or missing — "
                "convert the official weights per docs/RUNBOOK.md "
                "(convert_lpips_torch_weights + save_lpips_params)"
            )
        params = load_lpips_params(os.path.expanduser(path))
        model = LPIPSVgg()
        _LPIPS_STATE = (jax.jit(model.apply), params)
    apply_fn, params = _LPIPS_STATE
    return lpips_batch(apply_fn, params, pred, target)

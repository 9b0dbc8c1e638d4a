"""Converter name coverage across model option variants.

Instantiates the live reference GRL with non-default projection/conv options
and checks the *key sets* match our generated torch names exactly (no forward
needed — structural parity for every config the converter claims to support).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from grlir.models.grl import GRL, GRLConfig
from grlir.utils import convert as C

BASE_T = dict(
    img_size=64, upscale=1, upsampler="", depths=[2], embed_dim=32,
    num_heads_window=[2], num_heads_stripe=[2], window_size=8,
    stripe_size=[8, None], stripe_groups=[None, 4], stripe_shift=True,
    mlp_ratio=2, anchor_window_down_factor=4,
)
BASE_J = dict(
    embed_dim=32, upscale=1, upsampler="", depths=(2,),
    num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
    stripe_size=(8, None), stripe_groups=(None, 4), stripe_shift=True,
    mlp_ratio=2, anchor_window_down_factor=4, drop_path_rate=0.0,
)


def _keysets(torch_kwargs, jax_kwargs):
    tm = oracle.reference_grl(**{**BASE_T, **torch_kwargs})
    torch_keys = set(tm.state_dict().keys())
    torch_keys = {k for k in torch_keys if not C._BUFFER_RE.search(k)}

    model = GRL(GRLConfig(**{**BASE_J, **jax_kwargs}))
    tmpl = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    ours = {C.flax_path_to_torch_key(p) for p in C._flatten(tmpl)}
    return torch_keys, ours


def _with_pointwise_fallback(ours, torch_keys):
    """Apply the converter's act-less SeparableConv alias (.2 -> .1)."""
    out = set()
    for k in ours:
        if k not in torch_keys:
            alt = k.replace(".2.weight", ".1.weight").replace(
                ".2.bias", ".1.bias")
            if alt in torch_keys:
                out.add(alt)
                continue
        out.add(k)
    return out


@pytest.mark.parametrize("tk,jk", [
    ({"conv_type": "3conv"}, {"conv_type": "3conv"}),
    ({"conv_type": "1conv1x1"}, {"conv_type": "1conv1x1"}),
    ({"conv_type": "linear"}, {"conv_type": "linear"}),
    # NB through the main GRL the reference never forwards separable_conv_act
    # into its args namespace, so separable convs have NO activation there —
    # mirror with separable_conv_act=False (Sequential indices [0, 1])
    ({"qkv_proj_type": "separable_conv"},
     {"qkv_proj_type": "separable_conv", "separable_conv_act": False}),
    ({"anchor_proj_type": "conv2d"}, {"anchor_proj_type": "conv2d"}),
    ({"anchor_proj_type": "separable_conv"},
     {"anchor_proj_type": "separable_conv", "separable_conv_act": False}),
    ({"anchor_proj_type": "maxpool"}, {"anchor_proj_type": "maxpool"}),
    # one-stage patchmerging only reduces 2x: valid only for df=2 (a latent
    # reference constraint; df=4 would crash it too)
    ({"anchor_proj_type": "patchmerging", "anchor_window_down_factor": 2},
     {"anchor_proj_type": "patchmerging", "anchor_window_down_factor": 2}),
    ({"upscale": 3, "upsampler": "pixelshuffle"},
     {"upscale": 3, "upsampler": "pixelshuffle"}),
    ({"upscale": 8, "upsampler": "pixelshuffle"},
     {"upscale": 8, "upsampler": "pixelshuffle"}),
    ({"local_connection": True, "embed_dim": 36},
     {"local_connection": True, "embed_dim": 36}),
])
def test_variant_key_sets_match(tk, jk):
    torch_keys, ours = _keysets(tk, jk)
    ours = _with_pointwise_fallback(ours, torch_keys)
    missing = torch_keys - ours
    extra = ours - torch_keys
    assert not missing, f"our tree misses torch keys: {sorted(missing)[:6]}"
    assert not extra, f"we generate unknown keys: {sorted(extra)[:6]}"


def test_multi_stage_anchor_key_sets():
    tk = {"anchor_one_stage": False, "anchor_proj_type": "conv2d"}
    torch_keys, ours = _keysets(tk, {"anchor_one_stage": False,
                                     "anchor_proj_type": "conv2d"})
    assert torch_keys == ours, (sorted(torch_keys - ours)[:5],
                                sorted(ours - torch_keys)[:5])

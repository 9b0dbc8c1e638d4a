"""Golden forward parity: grlir GRL vs the live reference PyTorch GRL.

Converted reference weights + identical random input must produce outputs equal
to float tolerance across every attention path (shifted/unshifted windows, H/V
stripes, shifted stripes, CAB, all reconstruction tails).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

import oracle
from grlir.models.grl import GRL, GRLConfig
from grlir.utils import convert as C

# depth 4 exercises: window shift (blocks 0,2), H stripes (0,2) / V stripes (1,3),
# shifted stripes (blocks 2,3), per the stage schedule.
COMMON = dict(
    depths=[4],
    embed_dim=32,
    num_heads_window=[2],
    num_heads_stripe=[2],
    window_size=8,
    stripe_size=[8, None],
    stripe_groups=[None, 4],
    stripe_shift=True,
    mlp_ratio=2,
    qkv_proj_type="linear",
    anchor_proj_type="avgpool",
    anchor_one_stage=True,
    anchor_window_down_factor=4,
    conv_type="1conv",
    init_method="n",
)


def _jax_config(torch_kwargs, **extra) -> GRLConfig:
    k = torch_kwargs
    return GRLConfig(
        in_channels=k.get("in_channels", 3),
        embed_dim=k["embed_dim"],
        upscale=k.get("upscale", 1),
        upsampler=k.get("upsampler", ""),
        depths=tuple(k["depths"]),
        num_heads_window=tuple(k["num_heads_window"]),
        num_heads_stripe=tuple(k["num_heads_stripe"]),
        window_size=k["window_size"],
        stripe_size=tuple(k["stripe_size"]),
        stripe_groups=tuple(k["stripe_groups"]),
        stripe_shift=k["stripe_shift"],
        mlp_ratio=k["mlp_ratio"],
        anchor_window_down_factor=k["anchor_window_down_factor"],
        local_connection=k.get("local_connection", False),
        drop_path_rate=0.0,
        **extra,
    )


def _compare(torch_kwargs, h, w, atol=2e-5, in_ch=3):
    tm = oracle.reference_grl(img_size=64, **torch_kwargs)
    x = np.random.default_rng(0).standard_normal((1, in_ch, h, w)).astype(np.float32)
    x = np.abs(x) % 1.0  # keep in [0,1) like real image data
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    cfg = _jax_config(torch_kwargs)
    model = GRL(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, in_ch), jnp.float32),
    )
    params = C.convert_torch_state_dict(oracle.state_dict_numpy(tm), template)
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_golden_sr_pixelshuffledirect():
    _compare({**COMMON, "upscale": 4, "upsampler": "pixelshuffledirect"}, 64, 64)


def test_golden_attn_io_cm():
    """The boundary-fused attention path must hit the same torch oracle."""
    _compare_extra({**COMMON, "upscale": 4, "upsampler": "pixelshuffledirect"},
                   64, 64, attn_io="cm")


def _compare_extra(torch_kwargs, h, w, atol=2e-5, in_ch=3, **extra):
    tm = oracle.reference_grl(img_size=64, **torch_kwargs)
    x = np.random.default_rng(0).standard_normal((1, in_ch, h, w)).astype(np.float32)
    x = np.abs(x) % 1.0
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    cfg = _jax_config(torch_kwargs, **extra)
    model = GRL(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, in_ch), jnp.float32))
    params = C.convert_torch_state_dict(oracle.state_dict_numpy(tm), template)
    got = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=atol, rtol=1e-4)


def test_golden_sr_pixelshuffle():
    _compare({**COMMON, "upscale": 2, "upsampler": "pixelshuffle"}, 64, 64)


def test_golden_dn_identity_tail():
    _compare({**COMMON, "upscale": 1, "upsampler": ""}, 64, 64)


def test_golden_bsr_nearest_conv():
    _compare({**COMMON, "upscale": 4, "upsampler": "nearest+conv"}, 32, 32)


def test_golden_local_connection_cab():
    _compare(
        {**COMMON, "upscale": 1, "upsampler": "", "local_connection": True}, 64, 64
    )


def test_golden_nonsquare_input_with_padding():
    # 40x56 forces reflect padding; fixed-stripe config so the torch reference
    # can run it too (grouped stripes crash the reference on non-square inputs —
    # see grlir.ops.geometry.build_geometry docstring)
    _compare(
        {**COMMON, "stripe_size": [8, 8], "stripe_groups": [None, None],
         "upscale": 4, "upsampler": "pixelshuffledirect"},
        40, 56,
    )


def test_nonsquare_grouped_stripes_runs():
    """The reference crashes here; grlir supports it via true vertical-stripe
    geometry.  Shape/finite smoke check only (no oracle exists)."""
    cfg = _jax_config({**COMMON, "upscale": 4, "upsampler": "pixelshuffledirect"})
    model = GRL(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 40, 56, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = np.asarray(model.apply(params, x))
    assert y.shape == (1, 160, 224, 3)
    assert np.isfinite(y).all()


def test_golden_depth6_two_stages():
    kw = {
        **COMMON,
        "depths": [4, 2],
        "num_heads_window": [2, 2],
        "num_heads_stripe": [2, 2],
        "upscale": 1,
        "upsampler": "",
    }
    _compare(kw, 64, 64)


def test_golden_df2():
    _compare(
        {**COMMON, "anchor_window_down_factor": 2, "upscale": 4,
         "upsampler": "pixelshuffledirect"},
        64, 64,
    )


def test_golden_fixed_stripes_no_shift():
    _compare(
        {**COMMON, "stripe_size": [8, 8], "stripe_groups": [None, None],
         "stripe_shift": False, "upscale": 1, "upsampler": ""},
        64, 64,
    )

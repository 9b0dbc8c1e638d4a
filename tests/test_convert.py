"""Weight-converter tests: name mapping completeness + transform round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.models import zoo
from grlir.models.grl import GRL
from grlir.utils import convert as C


def _make_params(cfg):
    model = GRL(cfg)
    x = jnp.zeros((1, 32, 32, cfg.in_channels), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


def _to_torch_style(params):
    """Inverse transform: produce a torch-named state dict from flax params."""
    flat = C._flatten(params)
    sd = {}
    for path, v in flat.items():
        key = C.flax_path_to_torch_key(path)
        a = np.asarray(v)
        if path[-1] == "kernel":
            if a.ndim == 2:
                a = a.T
            elif a.ndim == 4:
                a = a.transpose(3, 2, 0, 1)
        assert key not in sd, f"duplicate torch key {key}"
        sd[key] = a
    return sd


@pytest.mark.parametrize("name,task", [("tiny", "sr"), ("tiny", "dn"), ("tiny", "bsr")])
def test_round_trip(name, task):
    cfg = zoo.make_config(name, task=task)
    params = _make_params(cfg)
    sd = _to_torch_style(params)
    restored = C.convert_torch_state_dict(sd, params)
    flat_a = C._flatten(params)
    flat_b = C._flatten({"params": restored["params"]})
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_expected_reference_names_present():
    """Spot-check that generated torch names match the reference module tree."""
    cfg = zoo.GRL_SMALL
    sd = _to_torch_style(_make_params(cfg))
    expected = [
        "conv_first.weight",
        "norm_start.weight",
        "layers.0.blocks.0.attn.qkv.body.weight",
        "layers.0.blocks.0.attn.anchor.body.0.reduction.weight",
        "layers.0.blocks.0.attn.window_attn.attn_transform.logit_scale",
        "layers.0.blocks.0.attn.window_attn.attn_transform.cpb_mlp.0.weight",
        "layers.0.blocks.0.attn.window_attn.attn_transform.cpb_mlp.2.weight",
        "layers.0.blocks.0.attn.stripe_attn.attn_transform1.logit_scale",
        "layers.0.blocks.0.attn.stripe_attn.attn_transform2.cpb_mlp.0.bias",
        "layers.0.blocks.0.attn.proj.weight",
        "layers.0.blocks.0.norm1.weight",
        "layers.0.blocks.0.mlp.fc1.weight",
        "layers.0.blocks.3.mlp.fc2.bias",
        "layers.0.conv.weight",
        "layers.3.conv.bias",
        "norm_end.weight",
        "conv_after_body.weight",
        "conv_before_upsample.0.weight",
        "upsample.up.0.weight",
        "upsample.up.2.weight",
        "conv_last.weight",
    ]
    for k in expected:
        assert k in sd, f"missing {k}"
    # cpb_mlp.2 has no bias in the reference (CPB_MLP, mixed_attn_block.py:24-31)
    assert "layers.0.blocks.0.attn.window_attn.attn_transform.cpb_mlp.2.bias" not in sd


def test_cab_names_for_base():
    sd = _to_torch_style(_make_params(zoo.make_config("base", task="dn")))
    for k in [
        "layers.0.blocks.0.conv.cab.0.weight",
        "layers.0.blocks.0.conv.cab.2.weight",
        "layers.0.blocks.0.conv.cab.3.attention.1.weight",
        "layers.0.blocks.0.conv.cab.3.attention.3.bias",
    ]:
        assert k in sd, f"missing {k}"


def test_buffer_stripping():
    cfg = zoo.make_config("tiny", task="sr")
    params = _make_params(cfg)
    sd = {f"model.{k}": v for k, v in _to_torch_style(params).items()}
    # simulate Lightning checkpoint pollution
    sd["model.table_w"] = np.zeros((1,))
    sd["model.index_sh_a2w"] = np.zeros((1,))
    sd["model.mask_w"] = np.zeros((1,))
    sd["model.mean"] = np.zeros((1, 3, 1, 1))
    sd["current_val_metric"] = np.zeros(())
    stripped = C.strip_prefix(sd, "model.")
    restored = C.convert_torch_state_dict(stripped, params)
    assert "params" in restored


def test_missing_key_raises():
    cfg = zoo.make_config("tiny", task="sr")
    params = _make_params(cfg)
    sd = _to_torch_style(params)
    sd.pop("conv_first.weight")
    with pytest.raises(KeyError):
        C.convert_torch_state_dict(sd, params)


def test_convert_cli_round_trip(tmp_path):
    """python -m grlir.utils.convert on a synthetic torch checkpoint."""
    import torch
    from flax import serialization

    cfg = zoo.make_config("tiny", task="sr")
    params = _make_params(cfg)
    sd = {f"model.{k}": torch.from_numpy(np.array(v))
          for k, v in _to_torch_style(params).items()}
    ckpt_path = tmp_path / "t.ckpt"
    torch.save({"state_dict": sd}, str(ckpt_path))

    out = tmp_path / "p.msgpack"
    C.main([str(ckpt_path), str(out), "--model", "tiny", "--task", "sr"])
    assert out.exists()
    # template for tiny/sr: init shapes then restore bytes
    from grlir.models.grl import GRL

    model = GRL(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    restored = serialization.from_bytes(template, out.read_bytes())
    flat_a = C._flatten(params)
    flat_b = C._flatten(restored)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))

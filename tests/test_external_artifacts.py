"""Artifact-gated parity tests — skipped unless the external weights are
present (no network egress in CI).  They light up the moment the artifacts
land (VERDICT r1 item 9):

  GRLIR_VGG19=/path/to/vgg19-dcbb9e9d.pth         pytest tests/test_external_artifacts.py
  GRLIR_LPIPS_VGG16=/path/to/vgg16-397923af.pth \
  GRLIR_LPIPS_LIN=/path/to/lpips_vgg.pth          pytest ...
  GRLIR_CKPT_DIR=/path/with/released/grl/ckpts    pytest ...

Acquisition + sha256 manifests: docs/RUNBOOK.md §External artifacts.
"""

import os
import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

VGG19 = os.environ.get("GRLIR_VGG19", "")
LPIPS_VGG16 = os.environ.get("GRLIR_LPIPS_VGG16", "")
LPIPS_LIN = os.environ.get("GRLIR_LPIPS_LIN", "")
CKPT_DIR = os.environ.get("GRLIR_CKPT_DIR", "")

needs_vgg19 = pytest.mark.skipif(
    not (VGG19 and osp.exists(osp.expanduser(VGG19))),
    reason="set GRLIR_VGG19 to torchvision vgg19-dcbb9e9d.pth")
needs_lpips = pytest.mark.skipif(
    not (LPIPS_VGG16 and osp.exists(osp.expanduser(LPIPS_VGG16))
         and LPIPS_LIN and osp.exists(osp.expanduser(LPIPS_LIN))),
    reason="set GRLIR_LPIPS_VGG16 + GRLIR_LPIPS_LIN")
needs_ckpts = pytest.mark.skipif(
    not (CKPT_DIR and osp.isdir(osp.expanduser(CKPT_DIR))),
    reason="set GRLIR_CKPT_DIR to the released GRL checkpoints")


def _torch_vgg_features(state_dict, x_nchw, upto_seq_idx):
    """Run torchvision-layout VGG features straight from the state dict
    (conv 3x3 pad 1 / relu / maxpool2) — an oracle without torchvision."""
    import torch.nn.functional as F

    x = x_nchw
    i = 0
    while i <= upto_seq_idx:
        wk = f"features.{i}.weight"
        if wk in state_dict:
            x = F.conv2d(x, state_dict[wk], state_dict[f"features.{i}.bias"],
                         padding=1)
            i += 1
            if i <= upto_seq_idx:
                x = F.relu(x)
            i += 1
        else:
            x = F.max_pool2d(x, 2, 2)
            i += 1
    return x


@needs_vgg19
def test_vgg19_feature_parity():
    from grlir.models.vgg import (
        IMAGENET_MEAN, IMAGENET_STD, VGG19_NAMES,
        VGGFeatureExtractor, convert_vgg_torch_weights)
    from grlir.utils.convert import load_torch_checkpoint

    sd = load_torch_checkpoint(osp.expanduser(VGG19))
    layers = ("conv3_4", "conv5_4")
    model = VGGFeatureExtractor(layers, use_input_norm=False)
    params = convert_vgg_torch_weights(sd, layers)

    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    feats = model.apply(params, jnp.asarray(x))

    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for layer in layers:
        # torchvision sequence index of this conv layer
        conv_positions = [i for i, n in enumerate(VGG19_NAMES)
                          if n.startswith("conv")]
        conv_names = [n for n in VGG19_NAMES if n.startswith("conv")]
        seq_idx = conv_positions[conv_names.index(layer)]
        with torch.no_grad():
            want = _torch_vgg_features(tsd, tx, seq_idx).numpy()
        got = np.asarray(feats[layer]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@needs_vgg19
def test_perceptual_loss_finite_and_orders():
    from grlir.models.vgg import (
        VGGFeatureExtractor, convert_vgg_torch_weights, perceptual_loss)
    from grlir.utils.convert import load_torch_checkpoint

    weights = {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1.0,
               "conv4_4": 1.0, "conv5_4": 1.0}
    sd = load_torch_checkpoint(osp.expanduser(VGG19))
    vgg = VGGFeatureExtractor(tuple(weights))
    params = convert_vgg_torch_weights(sd, tuple(weights))
    apply_fn = lambda v: vgg.apply(params, v)

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    near = jnp.clip(gt + 0.01, 0, 1)
    far = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    p_near, _ = perceptual_loss(apply_fn, near, gt, weights)
    p_far, _ = perceptual_loss(apply_fn, far, gt, weights)
    assert 0 < float(p_near) < float(p_far)


@needs_lpips
def test_lpips_activation_roundtrip(tmp_path, monkeypatch):
    from grlir.metrics import lpips as L
    from grlir.utils.convert import load_torch_checkpoint

    lin = load_torch_checkpoint(osp.expanduser(LPIPS_LIN))
    vgg16 = load_torch_checkpoint(osp.expanduser(LPIPS_VGG16))
    params = L.convert_lpips_torch_weights(lin, vgg16)
    path = str(tmp_path / "lpips.npz")
    L.save_lpips_params(params, path)

    monkeypatch.setenv("GRLIR_LPIPS_NPZ", path)
    monkeypatch.setattr(L, "_LPIPS_STATE", None)
    rng = np.random.default_rng(0)
    gt = rng.random((1, 64, 64, 3)).astype(np.float32)
    near = np.clip(gt + 0.01, 0, 1).astype(np.float32)
    far = rng.random((1, 64, 64, 3)).astype(np.float32)
    d_same = float(L.lpips_metric(gt, gt)[0])
    d_near = float(L.lpips_metric(near, gt)[0])
    d_far = float(L.lpips_metric(far, gt)[0])
    assert d_same == pytest.approx(0.0, abs=1e-5)
    assert d_same < d_near < d_far


@needs_ckpts
def test_released_checkpoint_loads_and_runs():
    """Any released GRL .ckpt/.pth in $GRLIR_CKPT_DIR must convert + run.
    Eval-table parity (0.01 dB) additionally needs the benchmark datasets —
    see docs/RUNBOOK.md."""
    import glob

    from grlir.models import zoo
    from grlir.models.grl import GRL
    from grlir.train import load_pretrained

    paths = sorted(glob.glob(osp.join(osp.expanduser(CKPT_DIR), "*.ckpt")) +
                   glob.glob(osp.join(osp.expanduser(CKPT_DIR), "*.pth")))
    assert paths, f"no checkpoints in {CKPT_DIR}"
    converted = 0
    for path in paths:
        name = osp.basename(path).lower()
        size = ("tiny" if "tiny" in name else
                "small" if "small" in name else "base")
        for task, scale in (("sr", 4), ("dn", 1), ("bsr", 4)):
            cfg = zoo.make_config(size, task=task, upscale=scale)
            model = GRL(cfg)
            template = jax.eval_shape(
                model.init, jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32))
            try:
                params = load_pretrained(template, path)
            except (KeyError, ValueError):
                continue
            x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                            jnp.float32)
            y = model.apply(params, x)
            assert np.isfinite(np.asarray(y)).all(), path
            converted += 1
            break
    assert converted, "no checkpoint matched any model geometry"

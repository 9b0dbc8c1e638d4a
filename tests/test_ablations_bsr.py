"""Ablation attention paths + BSR dataset/degradation tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grlir.models.grl import GRL, GRLConfig


def _run(cfg, hw=32):
    model = GRL(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, hw, hw, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    return np.asarray(y), params


BASE = dict(embed_dim=32, upscale=1, upsampler="", depths=(2,),
            num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
            mlp_ratio=2, stripe_size=(8, 8), stripe_groups=(None, None),
            stripe_shift=True, drop_path_rate=0.0)


def test_plain_stripe_attention_no_anchor():
    """df=1 drops the anchor projection like the ablation MixedAttention."""
    cfg = GRLConfig(**BASE, anchor_window_down_factor=1)
    y, params = _run(cfg)
    assert np.isfinite(y).all()
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(k.key) for k in p) for p, _ in flat]
    assert not any("anchor" in n for n in names)
    assert any("stripe_attn/attn_transform/" in n for n in names)


def test_double_window_ablation():
    cfg = GRLConfig(**BASE, anchor_window_down_factor=1, double_window=True)
    y, _ = _run(cfg)
    assert np.isfinite(y).all()


def test_stripe_square_ablation():
    cfg = GRLConfig(**BASE, anchor_window_down_factor=1, stripe_square=True)
    y, _ = _run(cfg)
    assert np.isfinite(y).all()


def test_out_proj_conv2d_ablation():
    """mixed_attn_block.py:892-895: 3x3-conv output projection (ablation-only)."""
    cfg = GRLConfig(**BASE, anchor_window_down_factor=2,
                    out_proj_type="conv2d")
    y, params = _run(cfg)
    assert np.isfinite(y).all()
    flat = jax.tree_util.tree_leaves_with_path(params)
    kshapes = {"/".join(str(k.key) for k in p): v.shape for p, v in flat}
    projs = [s for n, s in kshapes.items() if n.endswith("attn/proj/kernel")]
    assert projs and all(s == (3, 3, 32, 32) for s in projs), projs


def test_pretrained_window_size_plumbed():
    """grl.py:52-53,90-91: pretrained sizes reach the CPB coords tables."""
    cfg = GRLConfig(**BASE, anchor_window_down_factor=2,
                    pretrained_window_size=(16, 16),
                    pretrained_stripe_size=(16, 16))
    g = cfg.geometry((32, 32))
    g0 = GRLConfig(**BASE, anchor_window_down_factor=2).geometry((32, 32))
    assert not np.allclose(g["table_w"], g0["table_w"])
    y, _ = _run(cfg)
    assert np.isfinite(y).all()


def test_euclidean_dist_ablation():
    kw = {**BASE, "stripe_size": (8, None), "stripe_groups": (None, 4)}
    cfg = GRLConfig(**kw, anchor_window_down_factor=4, euclidean_dist=True)
    y, _ = _run(cfg)
    assert np.isfinite(y).all()


def test_bsr_dataset_synthetic(tmp_path, monkeypatch):
    """BSRDataset end-to-end on a synthetic corpus: 400px pipeline -> LR/HR/USM."""
    import cv2

    from grlir.data.base import TRAIN
    from grlir.data.bsr import BSRDataset
    from grlir.data.tasks import TaskConfig

    root = tmp_path / "data"
    d = root / "OST" / "imgs"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    entries = []
    for i in range(2):
        name = f"t{i}.png"
        img = (rng.random((420, 440, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        entries.append({"path": f"imgs/{name}"})
    info = root / "image_info" / "OST"
    info.mkdir(parents=True)
    (info / "train.json").write_text(json.dumps(entries))
    monkeypatch.setenv("GRLIR_DATA_ROOT", str(root))
    monkeypatch.setenv("GRLIR_CACHE_DIR", str(tmp_path / "cache"))

    cfg = TaskConfig(name="bsr", dataset="ost", patch_size=16, scale=4,
                     use_cache=False)
    ds = BSRDataset(cfg, TRAIN)
    sample = ds[0]
    assert sample["img_lq"].shape == (16, 16, 3)
    assert sample["img_gt"].shape == (64, 64, 3)
    assert sample["img_gt_usm"].shape == (64, 64, 3)
    for k in ("img_lq", "img_gt", "img_gt_usm"):
        v = sample[k]
        assert v.dtype == np.float32 and np.isfinite(v).all()
        assert 0.0 <= v.min() and v.max() <= 1.0
    # usm target differs from plain gt
    assert not np.allclose(sample["img_gt"], sample["img_gt_usm"])

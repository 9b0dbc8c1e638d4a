"""Regression tests for round-1 VERDICT parity nicks: MixUp step gate,
GT-free validation, progressive-batch mesh divisibility, grayscale _y metrics,
classification-mode losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from grlir.engines.preprocess import make_train_preprocess
from grlir.engines.validate import validate
from grlir.metrics import basic as MB


# ---- MixUp step gate (reference: engines/base.py:168, epoch > 5) ----

def _mix_batch():
    rng = np.random.default_rng(0)
    gt = rng.random((4, 8, 8, 3)).astype(np.float32)
    lq = rng.random((4, 4, 4, 3)).astype(np.float32)
    return {"img_lq": jnp.asarray(lq), "img_gt": jnp.asarray(gt)}


def test_mixup_gated_before_start_step():
    pre = make_train_preprocess("sr", use_mixup=True, scale=2,
                                mixup_start_step=100)
    batch = _mix_batch()
    key = jax.random.PRNGKey(0)
    lq, gt = pre(batch, key, jnp.asarray(5))
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(batch["img_lq"]))
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(batch["img_gt"]))


def test_mixup_active_after_start_step():
    pre = make_train_preprocess("sr", use_mixup=True, scale=2,
                                mixup_start_step=100)
    batch = _mix_batch()
    key = jax.random.PRNGKey(0)
    lq, gt = pre(batch, key, jnp.asarray(200))
    assert not np.allclose(np.asarray(gt), np.asarray(batch["img_gt"]))


def test_mixup_unconditional_without_step():
    # legacy 2-arg call path still mixes whenever use_mixup is on
    pre = make_train_preprocess("sr", use_mixup=True, scale=2)
    batch = _mix_batch()
    lq, gt = pre(batch, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(gt), np.asarray(batch["img_gt"]))


# ---- GT-free validation through the generic validate() path ----

class _Identity:
    def __call__(self, x):
        return x


def _gt_free_batch(idx=0):
    rng = np.random.default_rng(idx)
    lq = rng.random((1, 96, 96, 3)).astype(np.float32)
    return {"img_lq": lq, "img_gt": np.zeros((1, 1), np.float32),
            "indices": np.array([idx]), "filenames": [f"real{idx}.png"]}


def test_validate_gt_free_niqe_only():
    loader = [_gt_free_batch(i) for i in range(2)]
    res = validate(_Identity(), loader, ("niqe",), task="bsr", scale=4)
    assert np.isfinite(res["niqe"])


def test_validate_gt_free_rejects_full_reference_metrics():
    loader = [_gt_free_batch()]
    with pytest.raises(ValueError, match="GT-free"):
        validate(_Identity(), loader, ("psnr", "niqe"), task="bsr", scale=4)


def test_validate_unknown_metric_clear_error():
    rng = np.random.default_rng(0)
    gt = rng.random((1, 32, 32, 3)).astype(np.float32)
    batch = {"img_lq": gt, "img_gt": gt, "indices": np.array([0]),
             "filenames": ["a.png"]}
    with pytest.raises(ValueError, match="unknown validation metric"):
        validate(_Identity(), [batch], ("accuracy",), task="dn")


# ---- grayscale *_y metrics degrade to plain variants ----

def test_y_metrics_on_single_channel():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    b = jnp.clip(a + 0.05, 0, 1)
    np.testing.assert_allclose(np.asarray(MB.psnr_y(a, b)),
                               np.asarray(MB.psnr(a, b)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(MB.ssim_y(a, b)),
                               np.asarray(MB.ssim(a, b)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(MB.psnrb_y(a, b)),
                               np.asarray(MB.psnrb(a, b)), rtol=1e-6)


# ---- classification-mode losses (reference: engines/base.py:184-204) ----

def test_cross_entropy_pixel_loss_matches_torch():
    from grlir.losses.classification import build_classification_loss
    from grlir.losses import LOSS_FNS

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 4, 4, 256)).astype(np.float32)  # C=1
    target = rng.random((2, 4, 4, 1)).astype(np.float32)

    fn = build_classification_loss({"cross_entropy": 1.0}, LOSS_FNS,
                                   one_hot_label=True)
    total, parts = fn(jnp.asarray(logits), jnp.asarray(target))

    # torch oracle: CrossEntropyLoss over the 256 classes
    tl = torch.from_numpy(logits.reshape(-1, 256))
    labels = torch.from_numpy((target * 255).astype(np.int64).reshape(-1))
    want = torch.nn.functional.cross_entropy(tl, labels).item()
    assert float(total) == pytest.approx(want, rel=1e-5)


def test_l1_ce_combined_loss_runs_and_grads():
    from grlir.losses.classification import build_classification_loss
    from grlir.losses import LOSS_FNS

    fn = build_classification_loss({"l1": 1.0, "cross_entropy": 1.0}, LOSS_FNS)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 3 * 256)), jnp.float32)
    target = jnp.asarray(rng.random((1, 4, 4, 3)), jnp.float32)

    def scalar(lg):
        return fn(lg, target)[0]

    g = jax.grad(scalar)(logits)
    total, parts = fn(logits, target)
    assert set(parts) == {"l1", "cross_entropy"}
    assert np.isfinite(float(total)) and np.isfinite(np.asarray(g)).all()


def test_soft_ce_lower_for_matching_distribution():
    from grlir.losses.classification import soft_cross_entropy_pixel_loss
    from grlir.utils.classification import img_to_prob

    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.random((1, 4, 4, 1)), jnp.float32)
    good_logits = jnp.log(img_to_prob(target) + 1e-9)
    bad_logits = jnp.zeros_like(good_logits)
    good = float(soft_cross_entropy_pixel_loss(good_logits, target))
    bad = float(soft_cross_entropy_pixel_loss(bad_logits, target))
    assert good < bad


def test_classification_train_step_decreases_loss():
    """End-to-end: tiny GRL with a 256-way head + l1_ce loss on 8-device mesh."""
    from grlir.engines.train import create_state, make_train_step
    from grlir.models.grl import GRL, GRLConfig
    from grlir.optim import build_optimizer
    from grlir.parallel.mesh import make_mesh, shard_batch
    import optax

    cfg = GRLConfig(
        embed_dim=16, upscale=1, upsampler="", depths=(1,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=4,
        mlp_ratio=1, stripe_size=(4, 4), stripe_groups=(None, None),
        stripe_shift=False, anchor_window_down_factor=2,
        in_channels=1, out_channels=256,
    )
    model = GRL(cfg)
    x = jnp.zeros((8, 8, 8, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    mesh = make_mesh(8)
    opt = build_optimizer("adam", schedule=optax.constant_schedule(1e-3))
    state = create_state(params, opt)
    step = make_train_step(model, opt, {"l1": 1.0, "cross_entropy": 1.0},
                           mesh=mesh, classification=True)
    key = jax.random.PRNGKey(1)
    gt = jax.random.uniform(key, (8, 8, 8, 1))
    batch = shard_batch({"img_lq": gt, "img_gt": gt}, mesh)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

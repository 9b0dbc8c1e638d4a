"""On-device training preprocessing: task physics + MixUp + progressive crops.

The reference runs these inside engine.forward on GPU (engines/base.py:118-169);
here they compose into the jitted train step via `make_train_preprocess`.
"""

from __future__ import annotations

import bisect
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grlir.data import degradations as D


def mixup(lq, gt, rng):
    """Beta(1.2,1.2) pairwise mixing (utils/dataset_utils.py:43-60)."""
    bs = gt.shape[0]
    k1, k2 = jax.random.split(rng)
    perm = jax.random.permutation(k1, bs)
    lam = jax.random.beta(k2, 1.2, 1.2, (bs, 1, 1, 1))
    gt = lam * gt + (1 - lam) * gt[perm]
    lq = lam * lq + (1 - lam) * lq[perm]
    return lq, gt


def random_crop_pair(lq, gt, patch: int, scale: int, rng):
    """Random aligned crop (Restormer progressive re-crop,
    engines/base.py:145-165) — same offset for every sample in the batch like
    the reference."""
    H = lq.shape[1]
    W = lq.shape[2]
    kx, ky = jax.random.split(rng)
    x0 = jax.random.randint(kx, (), 0, H - patch + 1)
    y0 = jax.random.randint(ky, (), 0, W - patch + 1)
    lq = jax.lax.dynamic_slice(
        lq, (0, x0, y0, 0), (lq.shape[0], patch, patch, lq.shape[3]))
    gt = jax.lax.dynamic_slice(
        gt, (0, x0 * scale, y0 * scale, 0),
        (gt.shape[0], patch * scale, patch * scale, gt.shape[3]))
    return lq, gt


def make_train_preprocess(
    task: str,
    blur_kernel: Optional[np.ndarray] = None,
    use_mixup: bool = False,
    scale: int = 1,
    crop_patch: Optional[int] = None,
    use_usm_target: bool = False,
    mixup_start_step: int = 0,
):
    """Build the (batch, rng[, step]) -> (lq, gt) device preprocessing.

    crop_patch: if set, randomly re-crop to this (LR) patch size — the
    progressive-training path; the trainer rebuilds the step when the stage
    changes (shape change => new compile, a handful over a run).
    use_usm_target: PSNR-engine option — train against the USM-sharpened GT
    when the batch provides one (engines/base_psnr.py:18-43).
    mixup_start_step: MixUp only activates after this step — the reference
    gates it on `current_epoch > 5` (engines/base.py:168); the trainer passes
    5 virtual epochs' worth of steps.  Gated inside jit via jnp.where so the
    step count stays a traced value (no recompile at the threshold).
    """

    def preprocess(batch, rng, step=None):
        if task == "paired_dual":
            lq = jnp.concatenate([batch["img_lq_l"], batch["img_lq_r"]], -1)
            gt = batch["img_gt"]
        else:
            lq, gt = batch["img_lq"], batch["img_gt"]
        if use_usm_target and "img_gt_usm" in batch:
            gt = batch["img_gt_usm"]

        if task == "dm":
            lq = D.dm_matlab(lq)
        elif task == "db":
            lq, gt = D.db_forward(lq, gt, blur_kernel, training=True)

        k1, k2 = jax.random.split(rng)
        if crop_patch is not None and crop_patch < lq.shape[1]:
            lq, gt = random_crop_pair(lq, gt, crop_patch, scale, k1)
        if use_mixup:
            mixed_lq, mixed_gt = mixup(lq, gt, k2)
            if step is None or mixup_start_step <= 0:
                lq, gt = mixed_lq, mixed_gt
            else:
                on = step >= mixup_start_step
                lq = jnp.where(on, mixed_lq, lq)
                gt = jnp.where(on, mixed_gt, gt)
        return lq, gt

    return preprocess


def progressive_stage(step: int, steps: Sequence[int]) -> int:
    """Stage index for progressive batch/patch schedules (engines/base.py:146)."""
    return bisect.bisect_left(list(steps), step)

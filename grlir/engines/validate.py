"""Validation loop: per-task preprocessing, tiled inference, metrics, reporting.

Mirrors BaseEngine.validation_step/_epoch_end (engines/base.py:256-436):
quantize restored/target to the 1/255 grid, shave(scale) for SR, per-image
metric vectors accumulated with sample indices and dedup-averaged, per-image
text table + CSV row output.
"""

from __future__ import annotations

import csv
import os
import os.path as osp
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from grlir.data import degradations as D
from grlir.metrics import basic as MB
from grlir.metrics.collect import MetricAccumulator
from grlir.utils.image import shave, tensor_round, to_uint8

METRIC_FNS: Dict[str, Callable] = {
    "psnr": MB.psnr,
    "psnr_y": MB.psnr_y,
    "ssim": MB.ssim,
    "ssim_y": MB.ssim_y,
    "psnrb": MB.psnrb,
    "psnrb_y": MB.psnrb_y,
}

# no-reference metrics: computable without a ground-truth image
GT_FREE_METRICS = ("niqe",)


def preprocess_val_batch(batch: dict, task: str,
                         blur_kernel: Optional[np.ndarray] = None):
    """Per-task on-device input synthesis (engines/base.py:118-142)."""
    if task == "paired_dual":
        lq = np.concatenate([batch["img_lq_l"], batch["img_lq_r"]], axis=-1)
        return lq, batch["img_gt"]
    lq = batch["img_lq"]
    gt = batch["img_gt"]
    if task == "dm":
        lq = np.asarray(D.dm_matlab(jnp.asarray(lq)))
    elif task == "db":
        lq, gt = D.db_forward(jnp.asarray(lq), jnp.asarray(gt), blur_kernel,
                              training=False)
        lq, gt = np.asarray(lq), np.asarray(gt)
    return lq, gt


def validate(
    restorer,
    loader,
    metric_names: Sequence[str] = ("psnr", "psnr_y", "ssim", "ssim_y"),
    task: str = "sr",
    scale: int = 1,
    blur_kernel: Optional[np.ndarray] = None,
    save_dir: Optional[str] = None,
    gather_across_hosts: bool = False,
    step: Optional[int] = None,
) -> Dict[str, float]:
    """Run a full validation pass; returns {metric: value} plus writes
    per-image table to save_dir if given."""
    names = [n for n in metric_names if n not in GT_FREE_METRICS]
    gt_free_names = [n for n in metric_names if n in GT_FREE_METRICS]
    acc = MetricAccumulator(list(metric_names))

    for batch in loader:
        lq, gt = preprocess_val_batch(batch, task, blur_kernel)
        # GT-free sets (bsr val with_gt=false) emit a (1,)-shaped placeholder
        # per sample (data/bsr.py); only no-reference metrics are computable
        gt_free = np.asarray(gt).ndim < 4
        if gt_free and names:
            raise ValueError(
                f"full-reference metrics {names} requested on a GT-free "
                f"validation set; use metric=restorer_niqe (reference: "
                f"config/experiment/bsr/grl.yaml val.with_gt=False)"
            )
        restored = restorer(np.asarray(lq))
        restored = np.asarray(tensor_round(jnp.asarray(restored)))
        target = None if gt_free else np.asarray(tensor_round(jnp.asarray(gt)))

        if save_dir:
            _save_images(save_dir, task, batch["filenames"], lq, restored,
                         target)

        # reference shaves for any task containing "sr" — incl. synthetic bsr
        # val (engines/base.py "sr" in data_module.name check)
        if "sr" in task and not gt_free:
            restored_m = np.asarray(shave(jnp.asarray(restored), scale))
            target_m = np.asarray(shave(jnp.asarray(target), scale))
        else:
            restored_m, target_m = restored, target

        values = {}
        for n in names:
            if n == "lpips":
                from grlir.metrics.lpips import lpips_metric

                values[n] = lpips_metric(restored_m, target_m)
                continue
            if n not in METRIC_FNS:
                raise ValueError(
                    f"unknown validation metric {n!r}; available: "
                    f"{sorted(METRIC_FNS)} + ['lpips'] + {list(GT_FREE_METRICS)}"
                )
            values[n] = np.asarray(
                METRIC_FNS[n](jnp.asarray(restored_m), jnp.asarray(target_m))
            )
        for n in gt_free_names:
            if n == "niqe":
                from grlir.metrics.niqe import niqe_batch

                values[n] = niqe_batch(restored_m)
        acc.update(values, batch["indices"], batch["filenames"])

    if gather_across_hosts:
        acc.gather_across_hosts()
    results = acc.compute()
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        # step-stamped like the reference's per-image txt files
        # (engines/base.py:392-422); keep a stable latest alias too
        suffix = f"_{step}" if step is not None else ""
        with open(osp.join(save_dir, f"per_image_metrics{suffix}.txt"), "w") as f:
            f.write(acc.per_image_table())
        if suffix:
            with open(osp.join(save_dir, "per_image_metrics.txt"), "w") as f:
                f.write(acc.per_image_table())
    return results


def _save_images(save_dir, task, filenames, lq, restored, target):
    """LQ/HQ/GT dumps with per-task directory layout (engines/base.py:497-554)."""
    import cv2

    for sub in ("LQ", "HQ", "GT"):
        os.makedirs(osp.join(save_dir, sub), exist_ok=True)
    for i, name in enumerate(filenames):
        base = osp.splitext(osp.basename(name))[0] + ".png"
        subs = [("LQ", lq[i]), ("HQ", restored[i])]
        if target is not None:  # GT-free val has nothing to dump
            subs.append(("GT", target[i]))
        for sub, img in subs:
            arr = to_uint8(img)
            if arr.shape[-1] == 3:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
            cv2.imwrite(osp.join(save_dir, sub, base), arr)


def write_results_csv(path: str, tag: str, val_set: str,
                      results: Dict[str, float], step: int):
    """Append one row per (val_set, step) like the reference's final-validation
    CSV (engines/base.py:392-422)."""
    exists = osp.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["tag", "val_set", "step"] + list(results.keys()))
        w.writerow([tag, val_set, step] + [f"{v:.4f}" for v in results.values()])

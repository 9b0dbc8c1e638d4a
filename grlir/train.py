"""Training/eval entry point: `python -m grlir.train experiment=... key=value ...`.

Equivalent of the reference runner (tools/trainer.py:34-191): compose config,
build data module(s), model and engine, handle the three checkpoint load paths
(orbax resume / torch state_dict via converter / pretrained), run the step-based
training loop with periodic validation + best/last checkpointing, and finish
with a full multi-set validation written to CSV.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time
from dataclasses import fields as dc_fields
from typing import Dict, Optional

import numpy as np


def build_model_config(cfg: dict):
    """cfg['model'] (+ global dtype/remat) -> GRLConfig."""
    from grlir.models.grl import GRLConfig

    known = {f.name for f in dc_fields(GRLConfig)}
    m = {k: v for k, v in cfg["model"].items() if k in known}
    for seq_key in ("depths", "num_heads_window", "num_heads_stripe",
                    "stripe_size", "stripe_groups"):
        if seq_key in m:
            m[seq_key] = tuple(m[seq_key])
    # training default: the cm attention boundary wins inference (+8-15%)
    # but its backward is ~7% slower (29.9 vs 32.1 ms/step measured on one
    # chip, GRL-S bs8); param trees are identical, so train legacy and
    # serve cm unless the experiment overrides.
    m.setdefault("attn_io", "legacy")
    m["dtype"] = cfg.get("dtype", "float32")
    m["remat"] = cfg.get("remat", False)
    if cfg.get("remat_policy") is not None:
        m["remat_policy"] = cfg["remat_policy"]
    if cfg.get("classification", False):
        # per-pixel 256-way class head (engines/base.py classification mode)
        m["out_channels"] = 256 * m.get("in_channels", 3)
    return GRLConfig(**m)


def progressive_host_rows(per_dev_target: int, batch_size: int,
                          n_devices: int, n_processes: int) -> int:
    """Host-local row count for one progressive-batch stage.

    The reference's progressive batch sizes are PER-GPU (engines/base.py:
    145-165).  The loader provides batch_size x (devices/processes) host-local
    rows; the per-stage host-local slice is per_dev x (devices/processes), so
    the global batch assembled by shard_batch is per_dev x devices — the
    reference's per-GPU x world_size semantics on every process count.
    """
    per_dev = max(1, min(per_dev_target, batch_size))
    return per_dev * (n_devices // n_processes)


def load_pretrained(params_template, path: str):
    """Torch .ckpt/.pth -> flax params (tools/trainer.py:91-115 load path)."""
    from grlir.utils import convert as C

    sd = C.load_torch_checkpoint(path)
    for prefix in ("model.", "model_g.", ""):
        stripped = C.strip_prefix(sd, prefix)
        if stripped:
            try:
                return C.convert_torch_state_dict(stripped, params_template)
            except KeyError:
                continue
    raise KeyError(f"could not match {path} against the model parameter tree")


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from grlir.configs import load_config
    from grlir.data.module import IRDataModule
    from grlir.engines.inference import Restorer
    from grlir.engines.preprocess import make_train_preprocess
    from grlir.engines.train import create_state, make_eval_step, make_train_step
    from grlir.engines.validate import validate, write_results_csv
    from grlir.models.grl import GRL, param_count
    from grlir.optim import build_optimizer, current_lr
    from grlir.optim.schedules import SCHEDULES
    from grlir.parallel.mesh import (make_mesh, maybe_initialize_distributed,
                                     shard_batch)
    from grlir.utils.checkpoint import CheckpointManager
    from grlir.data import degradations as D

    if maybe_initialize_distributed():
        print(f"[grlir] distributed: process {jax.process_index()}/"
              f"{jax.process_count()}")

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    seed = cfg.get("seed", 1234)
    task = cfg["data_module"]["name"]
    if task == "paired" and cfg["data_module"].get("dual_pixel"):
        task = "paired_dual"

    out_dir = osp.expanduser(
        osp.join(cfg["io"]["base_output_path"], cfg["tag"],
                 f"version_{cfg['io']['version']}"))
    os.makedirs(out_dir, exist_ok=True)
    print(f"[grlir] output: {out_dir}")

    if cfg.get("engine", {}).get("name") == "base_gan":
        from grlir.engines.gan_runner import run_gan

        return run_gan(cfg, out_dir)

    # ---- model
    mcfg = build_model_config(cfg)
    model = GRL(mcfg)
    patch = cfg["patch_size"]
    in_hw = patch
    example = jnp.zeros((1, in_hw, in_hw, mcfg.in_channels), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), example)
    print(f"[grlir] model {cfg['model'].get('name')} "
          f"params={param_count(params)/1e6:.3f}M dtype={mcfg.dtype}")

    if cfg.get("pretrained_checkpoint"):
        template = jax.eval_shape(lambda: params)
        params = load_pretrained(template, cfg["pretrained_checkpoint"])
        print(f"[grlir] loaded pretrained {cfg['pretrained_checkpoint']}")

    # ---- data
    dm = IRDataModule({**cfg["data_module"],
                   "worker_mode": cfg.get("worker_mode")}, seed=seed)
    scale = int(cfg["data_module"].get("scale", 1))
    blur_kernel = (D.get_blur_kernel(cfg["data_module"].get("kernel_type",
                                                            "gaussian"))
                   if task == "db" else None)

    # ---- optimizer + schedule
    opt_cfg = cfg["optimizer"]
    sch_cfg = dict(cfg["lr_scheduler"])
    sch_name = sch_cfg.pop("name")
    base_lr = opt_cfg["lr"]
    schedule = SCHEDULES[sch_name](base_lr, **sch_cfg)
    optimizer = build_optimizer(
        opt_cfg["name"], schedule=schedule,
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        weight_decay=opt_cfg.get("weight_decay", 1e-2),
    )

    mesh = make_mesh(cfg.get("num_devices"))
    state = create_state(params, optimizer)
    use_usm = (cfg.get("engine", {}).get("name") == "base_psnr"
               and cfg.get("engine", {}).get("use_usm", False))

    # progressive (Restormer-style) batch/patch schedule (engines/base.py:145-165)
    prog_steps = list(cfg.get("steps") or [])
    prog_batches = list(cfg.get("batch_sizes") or [])
    prog_patches = list(cfg.get("patch_sizes") or [])

    # reference applies MixUp only after epoch 5 (engines/base.py:168);
    # translate to steps via the virtual-epoch length.  batch_size is
    # PER-DEVICE (reference: per-GPU batch x num_gpus, config/defaults.yaml),
    # so the global batch really is batch_size * mesh size.
    global_batch = int(cfg["batch_size"]) * mesh.devices.size
    steps_per_epoch = max(1, len(dm.train_dataset) // max(1, global_batch))
    # "current_epoch > 5" with 0-based epochs => first active epoch is 6,
    # i.e. after SIX full virtual epochs (round-2 advisor off-by-one)
    mixup_start = 6 * steps_per_epoch if cfg.get("mixup", False) else 0

    def build_step(crop_patch=None):
        pre = make_train_preprocess(
            task, blur_kernel, cfg.get("mixup", False), scale,
            crop_patch=crop_patch, use_usm_target=use_usm,
            mixup_start_step=mixup_start)
        return make_train_step(
            model, optimizer, cfg["loss"], mesh=mesh, preprocess=pre,
            classification=cfg.get("classification", False),
            one_hot_label=cfg.get("one_hot_label", True))

    train_step = build_step()
    if cfg.get("classification", False):
        # convert per-pixel class logits back to an image for validation
        # (reference form_images, engines/base.py:206-215)
        from grlir.losses.classification import logits_to_class_dist
        from grlir.utils.classification import (
            img_from_prob_argmax, img_from_prob_weighted)

        form = (img_from_prob_argmax
                if cfg.get("prob_to_image", "weighted_sum") == "argmax"
                else img_from_prob_weighted)
        eval_apply = lambda p, x: form(logits_to_class_dist(model.apply(p, x)))
    else:
        eval_apply = lambda p, x: model.apply(p, x)

    from grlir.utils.profiling import MetricsLogger

    logger = MetricsLogger(osp.join(out_dir, "metrics.jsonl"))
    ckpt = CheckpointManager(
        osp.join(out_dir, "checkpoints"),
        monitor=cfg["model_checkpoint"]["monitor"],
        mode=cfg["model_checkpoint"]["mode"],
        save_top_k=cfg["model_checkpoint"]["save_top_k"],
    )
    if cfg.get("resume", True) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"[grlir] resumed from step {int(state.step)}")

    metric_names = cfg["metric"]["val"]
    monitor = cfg["model_checkpoint"]["monitor"].replace("val_", "")
    best = {"value": None, "step": 0}

    def run_validation(step: int) -> Dict[str, float]:
        restorer = Restorer(eval_apply, state.params, scale=scale,
                            tile=cfg.get("tile", 0),
                            tile_overlap=cfg.get("tile_overlap", 0))
        all_results = {}
        for name, loader in dm.val_loaders(num_workers=cfg.get("num_workers", 2)).items():
            res = validate(
                restorer, loader, metric_names, task, scale, blur_kernel,
                save_dir=osp.join(out_dir, "images", name)
                if cfg.get("save_images") else None,
                gather_across_hosts=jax.process_count() > 1,
                step=step,
            )
            all_results[name] = res
            write_results_csv(osp.join(out_dir, "results.csv"), cfg["tag"],
                              name, res, step)
            line = " ".join(f"{k}={v:.4f}" for k, v in res.items())
            print(f"[grlir] step {step} val[{name}]: {line}")
        # best-so-far tracking on the monitored metric of the first val set
        # (engines/base.py:347-390 log-line semantics)
        first = next(iter(all_results.values()), {})
        cur = first.get(monitor)
        if cur is not None:
            better = (best["value"] is None
                      or (cfg["model_checkpoint"]["mode"] == "max"
                          and cur > best["value"])
                      or (cfg["model_checkpoint"]["mode"] == "min"
                          and cur < best["value"]))
            if better:
                best.update(value=cur, step=step)
            print(f"[grlir] best {monitor}={best['value']:.4f} "
                  f"@ step {best['step']}")
        return all_results

    if not cfg.get("training", True):
        run_validation(int(state.step))
        return

    # ---- training loop
    max_steps = int(cfg["trainer"]["max_steps"])
    log_every = int(cfg["trainer"].get("log_every_n_steps", 50))
    val_every = int(cfg["trainer"].get("val_check_interval", 5000))
    # per-device batch semantics: batch_size is PER-DEVICE, so each host
    # loads batch_size x (its share of mesh devices) and shard_batch lays
    # the result over the data axis (multi-host: process-local shards are
    # assembled into the global array, never replicated)
    assert mesh.devices.size % jax.process_count() == 0, (
        mesh.devices.size, jax.process_count())
    per_host = int(cfg["batch_size"]) * (mesh.devices.size
                                         // jax.process_count())
    loader = dm.train_loader(per_host, num_workers=cfg.get("num_workers", 2))
    stream = loader.infinite()
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    start_step = int(state.step)

    from grlir.engines.preprocess import progressive_stage

    current_stage = -1
    for step in range(start_step, max_steps):
        batch = next(stream)
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if prog_steps:
            stage = progressive_stage(step, prog_steps)
            if stage != current_stage:
                current_stage = stage
                crop = (prog_patches[stage] if stage < len(prog_patches)
                        else None)
                train_step = build_step(
                    crop if crop and crop < cfg["patch_size"] else None)
                print(f"[grlir] progressive stage {stage}: "
                      f"batch={prog_batches[stage] if stage < len(prog_batches) else '-'} "
                      f"patch={crop}")
            if stage < len(prog_batches):
                # see progressive_host_rows: the batch here is HOST-LOCAL
                # (per_host rows), so the slice bound is per_dev x this
                # host's device share, never the global device count
                bs = progressive_host_rows(
                    prog_batches[stage], int(cfg["batch_size"]),
                    mesh.devices.size, jax.process_count())
                batch = {k: v[:bs] for k, v in batch.items()}
        batch = shard_batch(batch, mesh)
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)

        if (step + 1) % log_every == 0:
            loss = float(metrics["loss"])
            lr = current_lr(state.opt_state)
            rate = (step + 1 - start_step) / (time.time() - t0)
            logger.log(step + 1, loss=loss, lr=lr, steps_per_sec=rate)
            print(f"[grlir] step {step+1}/{max_steps} loss={loss:.4f} "
                  f"lr={lr:.2e} {rate:.2f} it/s")

        if (step + 1) % val_every == 0 or (step + 1) == max_steps:
            results = run_validation(step + 1)
            first = next(iter(results.values())) if results else {}
            ckpt.save(step + 1, jax.device_get(state),
                      {k: v for k, v in first.items()})

    ckpt.close()
    logger.close()
    csv_path = osp.join(out_dir, "results.csv")
    if osp.exists(csv_path):
        from grlir.utils.report import parse_csv

        print(parse_csv(csv_path))  # final pivot table (utils_train.py:38-101)
    print("[grlir] done")


if __name__ == "__main__":
    main()

"""GAN training runner (BSR stage 2) — the `engine: base_gan` path of
`python -m grlir.train`.

Builds generator (cfg.model.model_g) + discriminator (cfg.model.model_d),
optionally warm-starts from the stage-1 PSNR checkpoint and a pretrained
discriminator (engines/base_gan.py:48-84 load paths), then runs the explicit
two-optimizer alternation from grlir.engines.gan with GT-free NIQE validation
(base_gan.py:149-168) and best-val_niqe checkpointing.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict


def run_gan(cfg: dict, out_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grlir.data.module import IRDataModule
    from grlir.engines.gan import (
        GANLossConfig,
        GANTrainState,
        create_gan_state,
        make_gan_train_step,
    )
    from grlir.engines.inference import Restorer
    from grlir.metrics.collect import MetricAccumulator
    from grlir.metrics.niqe import niqe_batch
    from grlir.models.discriminator import UNetDiscriminatorSN
    from grlir.models.grl import GRL, param_count
    from grlir.optim import build_optimizer
    from grlir.optim.schedules import SCHEDULES
    from grlir.parallel.mesh import make_mesh, shard_batch
    from grlir.train import build_model_config, load_pretrained
    from grlir.utils.checkpoint import CheckpointManager
    from grlir.utils.image import tensor_round

    seed = cfg.get("seed", 1234)
    patch = cfg["patch_size"]

    gcfg = build_model_config({**cfg, "model": cfg["model"]["model_g"]})
    generator = GRL(gcfg)
    dcfg = cfg["model"]["model_d"]
    disc = UNetDiscriminatorSN(
        num_feat=dcfg.get("num_feat", 64),
        skip_connection=dcfg.get("skip_connection", True),
    )

    key = jax.random.PRNGKey(seed)
    lq_example = jnp.zeros((1, patch, patch, gcfg.in_channels), jnp.float32)
    params_g = jax.jit(generator.init)(key, lq_example)
    gt_example = jnp.zeros(
        (1, patch * gcfg.upscale, patch * gcfg.upscale, 3), jnp.float32)
    disc_vars = disc.init(jax.random.PRNGKey(seed + 1), gt_example)
    print(f"[grlir] GAN: G={param_count(params_g)/1e6:.2f}M "
          f"D={param_count(disc_vars['params'])/1e6:.2f}M")

    eng = cfg.get("engine", {})
    # reference keeps the handoff keys at the config top level
    # (config/experiment/bsr/grl.yaml:16-17, read via hparams);
    # accept both locations
    for k in ("bsr_psnr_checkpoint", "bsr_discriminator_checkpoint"):
        if not eng.get(k) and cfg.get(k):
            eng[k] = cfg[k]
    if eng.get("bsr_psnr_checkpoint"):
        ckpt_path = osp.expanduser(eng["bsr_psnr_checkpoint"])
        if osp.isdir(ckpt_path):  # grlir orbax stage-1 output
            from grlir.utils.checkpoint import CheckpointManager as _CM

            mgr = _CM(ckpt_path)
            params_g = mgr.restore_params_only(
                jax.eval_shape(lambda: params_g))
            mgr.close()
        else:  # released torch checkpoint
            params_g = load_pretrained(
                jax.eval_shape(lambda: params_g), ckpt_path)
        print(f"[grlir] loaded PSNR generator {eng['bsr_psnr_checkpoint']}")
    if eng.get("bsr_discriminator_checkpoint"):
        from grlir.utils.convert import (
            convert_unet_discriminator,
            load_torch_checkpoint,
            strip_prefix,
        )

        sd = strip_prefix(
            load_torch_checkpoint(eng["bsr_discriminator_checkpoint"]),
            "model_d.")
        disc_vars = convert_unet_discriminator(
            sd, jax.eval_shape(lambda: disc_vars))
        print("[grlir] loaded pretrained discriminator")

    opt_cfg = cfg["optimizer"]
    sch_cfg = dict(cfg["lr_scheduler"])
    schedule = SCHEDULES[sch_cfg.pop("name")](opt_cfg["lr"], **sch_cfg)
    opt_g = build_optimizer(opt_cfg["name"], schedule=schedule,
                            betas=tuple(opt_cfg.get("betas", (0.9, 0.999))))
    opt_d = build_optimizer(opt_cfg["name"], schedule=schedule,
                            betas=tuple(opt_cfg.get("betas", (0.9, 0.999))))

    loss_cfg = cfg.get("loss", {})
    dm_train = cfg["data_module"].get("train", {})
    gan_cfg = GANLossConfig(
        pixel_loss=loss_cfg.get("pixel_loss", "l1"),
        pixel_weight=loss_cfg.get("pixel_weight", 1.0),
        perceptual_weight=loss_cfg.get("perceptual_weight", 1.0),
        gan_type=loss_cfg.get("gan_type", "vanilla"),
        gan_weight=loss_cfg.get("gan_weight", 0.1),
        use_usm_pixel=dm_train.get("use_usm_pixel", True),
        use_usm_percep=dm_train.get("use_usm_percep", True),
        use_usm_gan=dm_train.get("use_usm_gan", False),
    )

    # perceptual term requires VGG19 weights (user-supplied; no egress here)
    perceptual_fn = None
    vgg_path = cfg.get("vgg_pretrained")
    if vgg_path and osp.exists(osp.expanduser(vgg_path)):
        from grlir.models.vgg import (
            VGGFeatureExtractor,
            convert_vgg_torch_weights,
            perceptual_loss,
        )
        from grlir.utils.convert import load_torch_checkpoint

        weights = loss_cfg.get("perceptual_layer_weights",
                               GANLossConfig().perceptual_layer_weights)
        vgg = VGGFeatureExtractor(tuple(weights))
        vgg_params = convert_vgg_torch_weights(
            load_torch_checkpoint(osp.expanduser(vgg_path)), tuple(weights))

        def perceptual_fn(pred, target):  # noqa: F811
            percep, _ = perceptual_loss(
                lambda v: vgg.apply(vgg_params, v), pred, target, weights)
            return percep

        print(f"[grlir] perceptual loss active (VGG from {vgg_path})")

    mesh = make_mesh(cfg.get("num_devices"))
    state = create_gan_state(params_g, disc_vars, opt_g, opt_d)
    # reference protocol (Lightning optimizer_idx loop: fresh G forward for
    # the D step + 3 SN power iterations, base_gan.py:86-90) is the default;
    # set engine.lightning_parity=false for the BasicSR-style single-forward
    # step (measured 1.156x faster/step at the BSR recipe shape —
    # tools/bench_gan_step.py, BENCH_NOTES.md)
    lightning_parity = bool(eng.get("lightning_parity", True))
    print(f"[grlir] GAN protocol: "
          f"{'lightning-parity' if lightning_parity else 'single-forward'}")
    step = make_gan_train_step(generator, disc, opt_g, opt_d, gan_cfg,
                               perceptual_fn=perceptual_fn, mesh=mesh,
                               lightning_parity=lightning_parity)

    ckpt = CheckpointManager(
        osp.join(out_dir, "checkpoints"),
        monitor=cfg["model_checkpoint"].get("monitor", "val_niqe"),
        mode=cfg["model_checkpoint"].get("mode", "min"),
        save_top_k=cfg["model_checkpoint"].get("save_top_k", 1),
    )
    if cfg.get("resume", True) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"[grlir] resumed GAN from step {int(state.step)}")

    dm = IRDataModule({**cfg["data_module"],
                   "worker_mode": cfg.get("worker_mode")}, seed=seed)
    scale = int(cfg["data_module"].get("scale", 4))

    def run_validation(step_num: int) -> Dict[str, float]:
        restorer = Restorer(lambda p, x: generator.apply(p, x),
                            state.params_g, scale=scale,
                            tile=cfg.get("tile", 0),
                            tile_overlap=cfg.get("tile_overlap", 0))
        results = {}
        for name, loader in dm.val_loaders().items():
            acc = MetricAccumulator(["niqe"])
            for batch in loader:
                restored = restorer(np.asarray(batch["img_lq"]))
                restored = np.asarray(tensor_round(jnp.asarray(restored)))
                acc.update({"niqe": niqe_batch(restored)},
                           batch["indices"], batch["filenames"])
            res = acc.compute()
            results[name] = res
            print(f"[grlir] step {step_num} val[{name}]: "
                  f"niqe={res.get('niqe', float('nan')):.4f}")
        return results

    if not cfg.get("training", True):
        run_validation(int(state.step))
        return

    max_steps = int(cfg["trainer"]["max_steps"])
    log_every = int(cfg["trainer"].get("log_every_n_steps", 50))
    val_every = int(cfg["trainer"].get("val_check_interval", 10000))
    loader = dm.train_loader(cfg["batch_size"],
                             num_workers=cfg.get("num_workers", 2))
    stream = loader.infinite()
    t0 = time.time()
    start = int(state.step)

    for step_num in range(start, max_steps):
        batch = next(stream)
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        batch = shard_batch(batch, mesh)
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)

        if (step_num + 1) % log_every == 0:
            rate = (step_num + 1 - start) / (time.time() - t0)
            print(f"[grlir] gan step {step_num+1}/{max_steps} "
                  f"g={float(metrics['loss_g']):.4f} "
                  f"d={float(metrics['loss_d']):.4f} {rate:.2f} it/s")

        if (step_num + 1) % val_every == 0 or (step_num + 1) == max_steps:
            results = run_validation(step_num + 1)
            first = next(iter(results.values())) if results else {}
            ckpt.save(step_num + 1, jax.device_get(state),
                      {f"val_{k}": v for k, v in first.items()})

    ckpt.close()
    print("[grlir] gan done")

"""End-to-end BSR stage-2 (GAN) through the train CLI: synthetic OST corpus,
BSRGAN degradation pipeline, two-optimizer alternation, GT-free NIQE
validation, best-val_niqe checkpointing (gan_runner.run_gan)."""

import json
import os
import os.path as osp

import numpy as np
import pytest


@pytest.fixture
def bsr_data_root(tmp_path, monkeypatch):
    import cv2

    root = tmp_path / "data"
    rng = np.random.default_rng(0)

    ost = root / "OST" / "train"
    ost.mkdir(parents=True)
    items = []
    for i in range(3):
        name = f"{i:03d}.png"
        cv2.imwrite(str(ost / name),
                    (rng.random((80, 96, 3)) * 255).astype(np.uint8))
        items.append({"path": f"train/{name}"})
    info = root / "image_info" / "OST"
    info.mkdir(parents=True)
    (info / "train.json").write_text(json.dumps(items))

    # GT-free NIQE val: Set5-shaped paired _X4 test set, big enough for
    # NIQE's 96px blocks after x4 restoration (56px LR -> 224px HQ)
    set5 = root / "test_set" / "Set5"
    (set5 / "HR").mkdir(parents=True)
    (set5 / "LR").mkdir(parents=True)
    val = []
    for i in range(1):
        cv2.imwrite(str(set5 / "HR" / f"v{i}.png"),
                    (rng.random((224, 224, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(set5 / "LR" / f"v{i}.png"),
                    (rng.random((56, 56, 3)) * 255).astype(np.uint8))
        val.append({"path_gt": f"Set5/HR/v{i}.png",
                    "path_lq": f"Set5/LR/v{i}.png"})
    info2 = root / "image_info" / "Set5"
    info2.mkdir(parents=True)
    (info2 / "test_X4.json").write_text(json.dumps(val))

    monkeypatch.setenv("GRLIR_DATA_ROOT", str(root))
    monkeypatch.setenv("GRLIR_CACHE_DIR", str(tmp_path / "cache"))
    return root


@pytest.mark.slow
def test_bsr_gan_stage_end_to_end(bsr_data_root, tmp_path, capsys):
    from grlir.train import main

    main([
        "experiment=bsr/grl",
        "tag=gan_it",
        f"io.base_output_path={tmp_path}/out",
        "data_module.train.dataset=ost",
        "data_module.val.dataset=set5",
        "model.model_g.embed_dim=16",
        "model.model_g.depths=[2]",
        "model.model_g.num_heads_window=[2]",
        "model.model_g.num_heads_stripe=[2]",
        "model.model_g.local_connection=false",
        "model.model_d.num_feat=16",
        "patch_size=16",
        "batch_size=2",
        "remat=false",
        "trainer.max_steps=2",
        "trainer.val_check_interval=2",
        "trainer.log_every_n_steps=1",
        "num_workers=1",
        "num_devices=1",
    ])
    out = capsys.readouterr().out
    assert "GAN: G=" in out            # both nets built
    assert "gan step 2/2" in out       # alternation ran
    assert "niqe=" in out              # GT-free validation computed
    # reference Lightning protocol is the config default (base_gan.yaml)
    assert "GAN protocol: lightning-parity" in out
    outdir = osp.join(str(tmp_path), "out", "gan_it", "version_0")
    assert os.listdir(osp.join(outdir, "checkpoints"))  # best-niqe ckpt saved


@pytest.mark.slow
def test_bsr_two_stage_handoff(bsr_data_root, tmp_path, capsys):
    """Stage-1 PSNR training -> stage-2 GAN warm-started from the stage-1
    orbax checkpoint directory (gan_runner.py bsr_psnr_checkpoint path)."""
    from grlir.train import main

    g_small = [
        "model.embed_dim=16", "model.depths=[2]",
        "model.num_heads_window=[2]", "model.num_heads_stripe=[2]",
        "model.local_connection=false",
    ]
    main([
        "experiment=bsr/grl_psnr", "tag=psnr_it",
        f"io.base_output_path={tmp_path}/out",
        "data_module.train.dataset=ost", "data_module.val.dataset=set5",
        *g_small,
        "patch_size=16", "batch_size=2", "remat=false",
        "trainer.max_steps=2", "trainer.val_check_interval=2",
        "trainer.log_every_n_steps=1", "num_workers=1", "num_devices=1",
    ])
    stage1_ckpts = osp.join(str(tmp_path), "out", "psnr_it", "version_0",
                            "checkpoints")
    assert os.listdir(stage1_ckpts)

    main([
        "experiment=bsr/grl", "tag=gan_it2",
        f"io.base_output_path={tmp_path}/out",
        "data_module.train.dataset=ost", "data_module.val.dataset=set5",
        "model.model_g.embed_dim=16", "model.model_g.depths=[2]",
        "model.model_g.num_heads_window=[2]",
        "model.model_g.num_heads_stripe=[2]",
        "model.model_g.local_connection=false",
        "model.model_d.num_feat=16",
        f"engine.bsr_psnr_checkpoint={stage1_ckpts}",
        "engine.lightning_parity=false",
        "patch_size=16", "batch_size=2", "remat=false",
        "trainer.max_steps=1", "trainer.val_check_interval=1",
        "trainer.log_every_n_steps=1", "num_workers=1", "num_devices=1",
    ])
    out = capsys.readouterr().out
    assert "loaded PSNR generator" in out
    assert "niqe=" in out
    # the BasicSR-style protocol stays selectable from config
    assert "GAN protocol: single-forward" in out

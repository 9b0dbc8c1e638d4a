"""End-to-end trainer integration: synthetic data root -> train -> validate ->
checkpoint -> resume, all through `grlir.train.main` (the CLI surface)."""

import json
import os
import os.path as osp

import numpy as np
import pytest


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    """Fake GRLIR_DATA_ROOT with DIV2K train images + CBSD68 val set."""
    import cv2

    root = tmp_path / "data"
    rng = np.random.default_rng(0)

    div2k = root / "DIV2K" / "train"
    div2k.mkdir(parents=True)
    train_list = []
    for i in range(4):
        name = f"{i:04d}.png"
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(div2k / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        train_list.append({"path": f"train/{name}"})

    info = root / "image_info" / "DIV2K"
    info.mkdir(parents=True)
    (info / "train.json").write_text(json.dumps(train_list))

    test_dir = root / "test_set" / "CBSD68"
    test_dir.mkdir(parents=True)
    val_list = []
    for i in range(2):
        name = f"val{i}.png"
        img = (rng.random((33, 47, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(test_dir / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        val_list.append({"path": f"CBSD68/{name}"})
    info2 = root / "image_info" / "CBSD68"
    info2.mkdir(parents=True)
    (info2 / "test.json").write_text(json.dumps(val_list))

    monkeypatch.setenv("GRLIR_DATA_ROOT", str(root))
    monkeypatch.setenv("GRLIR_CACHE_DIR", str(tmp_path / "cache"))
    return root


def _overrides(tmp_path, steps=4):
    return [
        "experiment=dn/grl",
        "tag=it",
        f"io.base_output_path={tmp_path}/out",
        "data_module.train.dataset=div2k",
        "data_module.val.dataset=cbsd68",
        "model.embed_dim=16",
        "model.depths=[2]",
        "model.num_heads_window=[2]",
        "model.num_heads_stripe=[2]",
        "patch_size=16",
        "batch_size=2",
        f"trainer.max_steps={steps}",
        "trainer.val_check_interval=2",
        "trainer.log_every_n_steps=1",
        "num_workers=1",
        "num_devices=1",
        "mixup=false",
        "save_images=true",
    ]


def test_train_validate_checkpoint_resume(data_root, tmp_path, capsys):
    from grlir.train import main

    main(_overrides(tmp_path, steps=4))
    out = capsys.readouterr().out
    assert "val[cbsd68]" in out
    assert "psnr" in out

    outdir = osp.join(str(tmp_path), "out", "it", "version_0")
    assert osp.exists(osp.join(outdir, "results.csv"))
    assert os.listdir(osp.join(outdir, "checkpoints"))
    # saved validation images
    assert os.listdir(osp.join(outdir, "images", "cbsd68", "HQ"))
    per_image = osp.join(outdir, "images", "cbsd68", "per_image_metrics.txt")
    assert osp.exists(per_image)

    # resume: raising max_steps continues from the checkpoint
    main(_overrides(tmp_path, steps=6))
    out2 = capsys.readouterr().out
    assert "resumed from step 4" in out2


def test_eval_only_mode(data_root, tmp_path, capsys):
    from grlir.train import main

    main(_overrides(tmp_path) + ["training=false", "tag=ev"])
    out = capsys.readouterr().out
    assert "val[cbsd68]" in out


def test_progressive_schedule(data_root, tmp_path, capsys):
    """Restormer-style progressive batch/patch re-cropping changes stage."""
    from grlir.train import main

    main(_overrides(tmp_path, steps=4) + [
        "tag=prog",
        "steps=[2]",
        "batch_sizes=[2,1]",
        "patch_sizes=[16,8]",   # stage 1 crops 16->8
    ])
    out = capsys.readouterr().out
    assert "progressive stage 0" in out
    assert "progressive stage 1" in out

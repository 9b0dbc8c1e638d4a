"""Config composition tests: groups, experiment overlays, overrides, interpolation."""

import pytest

from grlir.configs import ConfigView, load_config


def test_defaults_compose():
    cfg = load_config([])
    assert cfg["model"]["name"] == "grl_tiny"
    assert cfg["data_module"]["name"] == "sr"
    assert cfg["loss"] == {"charbonnier": 1.0}
    assert cfg["optimizer"]["name"] == "adamw"


def test_group_selection_and_override():
    cfg = load_config(["model=grl/grl_base", "loss=l1",
                       "optimizer.lr=0.001", "trainer.max_steps=42"])
    assert cfg["model"]["embed_dim"] == 180
    assert cfg["model"]["local_connection"] is True
    assert cfg["loss"] == {"l1": 1.0}
    assert cfg["optimizer"]["lr"] == 0.001
    assert cfg["trainer"]["max_steps"] == 42


def test_experiment_overlay_selects_groups():
    cfg = load_config(["experiment=jpeg/grl_p288"])
    assert cfg["data_module"]["name"] == "jpeg"
    assert cfg["data_module"]["quality_factor"] == 10
    assert cfg["trainer"]["max_steps"] == 175000
    assert "psnrb" in cfg["metric"]["val"]
    assert cfg["tile"] == 576 and cfg["tile_overlap"] == 72


def test_interpolation():
    cfg = load_config(["experiment=sr/grl_p256", "patch_size=48",
                       "data_module.scale=3"])
    # ${patch_size} inside data_module, ${data_module.scale} inside model
    assert cfg["data_module"]["patch_size"] == 48
    assert cfg["model"]["upscale"] == 3
    # string interpolation in the tag template
    assert "x3" in cfg["tag"] and "p48" in cfg["tag"]


def test_value_types_from_cli():
    cfg = load_config(["model.depths=[2,3]", "mixup=false", "seed=7",
                       "optimizer.lr=1e-5"])
    assert cfg["model"]["depths"] == [2, 3]
    assert cfg["mixup"] is False
    assert cfg["seed"] == 7
    assert cfg["optimizer"]["lr"] == pytest.approx(1e-5)


def test_config_view():
    v = ConfigView(load_config(["experiment=bsr/grl"]))
    assert v.engine.name == "base_gan"
    assert v.model.model_g.upsampler == "nearest+conv"
    assert v.model_checkpoint.monitor == "val_niqe"
    assert v.get("missing", 3) == 3
    assert "loss" in v


def test_all_experiments_compose():
    for exp in ["sr/grl_p256", "dn/grl_p256", "jpeg/grl_p288", "dm/grl",
                "db_motion/grl_p480", "db_defocus/grl_p480",
                "bsr/grl_psnr", "bsr/grl"]:
        cfg = load_config([f"experiment={exp}"])
        assert "trainer" in cfg and "data_module" in cfg, exp


def test_all_model_configs_build():
    from grlir.train import build_model_config

    for m in ["grl/grl_tiny", "grl/grl_small", "grl/grl_base"]:
        cfg = load_config([f"model={m}"])
        mc = build_model_config(cfg)
        assert mc.embed_dim in (64, 128, 180)


def test_group_replacement_no_leak():
    """Selecting a group must REPLACE its subtree: sr's scale/load_lr must not
    leak into the dn data module (regression: progressive crop used scale=2)."""
    cfg = load_config(["experiment=dn/grl_p256"])
    assert "scale" not in cfg["data_module"]
    assert "load_lr" not in cfg["data_module"]
    cfg2 = load_config(["data_module=jpeg"])
    assert "scale" not in cfg2["data_module"]
    assert cfg2["data_module"]["quality_factor"] == 10
    # experiment overlays still deep-merge over their selected groups
    cfg3 = load_config(["experiment=sr/grl_p256"])
    assert cfg3["data_module"]["scale"] == 4
    assert cfg3["data_module"]["train"]["dataset"] == "df2k"

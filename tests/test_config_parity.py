"""Per-task experiment recipe parity: the composed grlir model config must
match the reference's composed model config field-for-field (geometry,
patch/batch, schedule) — VERDICT r1 item 4.

Reference composition = config/model/grl/*.yaml base + the experiment file's
`model:` override block with ${stripe_size1/2} / ${data_module.*} interpolation
(config/experiment/*/grl*.yaml).
"""

import os.path as osp

import pytest
import yaml

from grlir.configs import load_config

REF = "/root/reference/config"

# (grlir experiment, reference experiment file, reference model group file)
CASES = [
    ("sr/grl_p256", "experiment/sr/grl/grl_p256.yaml", "model/grl/grl_tiny.yaml"),
    ("dn/grl_p256", "experiment/dn/grl/grl_p256.yaml", "model/grl/grl_tiny.yaml"),
    ("jpeg/grl_p288", "experiment/jpeg/grl/grl_p288.yaml", "model/grl/grl_small.yaml"),
    ("dm/grl", "experiment/dm/grl.yaml", "model/grl/grl_small.yaml"),
    ("db_defocus/grl_p480", "experiment/db_defocus/grl_p480.yaml",
     "model/grl/grl_base.yaml"),
    ("db_motion/grl_p480", "experiment/db_motion/grl_p480.yaml",
     "model/grl/grl_base.yaml"),
    ("bsr/grl_psnr", "experiment/bsr/grl_psnr.yaml", "model/grl/grl_base.yaml"),
]

# model fields that must match the reference recipe exactly
GEOMETRY_FIELDS = [
    "embed_dim", "depths", "num_heads_window", "num_heads_stripe",
    "window_size", "stripe_size", "stripe_groups", "stripe_shift",
    "mlp_ratio", "anchor_window_down_factor", "upscale", "upsampler",
    "in_channels", "local_connection",
]


def _load(path):
    with open(osp.join(REF, path)) as f:
        return yaml.safe_load(f)


_SKIP = object()  # interpolation target lives outside the loaded files


def _resolve(node, root):
    """Resolve ${a.b} interpolations against the merged reference tree."""
    if isinstance(node, dict):
        return {k: _resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    if isinstance(node, str) and node.startswith("${") and node.endswith("}"):
        cur = root
        for part in node[2:-1].split("."):
            if not isinstance(cur, dict) or part not in cur:
                return _SKIP
            cur = cur[part]
        return _resolve(cur, root)
    return node


def _compose_reference_model(exp_file, model_file):
    exp = _load(exp_file)
    model = _load(model_file)["model"]
    model.update(exp.get("model", {}) or {})
    # bsr GAN recipe nests the generator under model_g
    if "model_g" in model:
        base = _load(model_file)["model"]
        base.update(exp["model"]["model_g"])
        model = base
    tree = dict(exp)
    tree["model"] = model
    return _resolve(model, tree), exp


@pytest.mark.parametrize("grlir_exp,ref_exp,ref_model", CASES)
def test_model_geometry_matches_reference(grlir_exp, ref_exp, ref_model):
    if not osp.isdir(REF):
        pytest.skip("reference tree unavailable")
    ref, exp = _compose_reference_model(ref_exp, ref_model)
    cfg = load_config([f"experiment={grlir_exp}"])
    got = cfg["model"]
    if "model_g" in got:
        got = got["model_g"]

    for field in GEOMETRY_FIELDS:
        if field not in ref:
            continue
        want = ref[field]
        if want is _SKIP:
            continue
        have = got[field]
        if field == "upsampler":
            want, have = want or "", have or ""
        assert have == want, f"{grlir_exp}: model.{field} = {have!r}, " \
                             f"reference has {want!r}"

    # training hyperparameters
    assert cfg["trainer"]["max_steps"] == exp["trainer"]["max_steps"], grlir_exp
    assert cfg["lr_scheduler"]["milestones"] == exp["lr_scheduler"]["milestones"]
    assert cfg["optimizer"]["lr"] == pytest.approx(exp["optimizer"]["lr"])
    assert cfg["batch_size"] == exp["batch_size"]
    if "tile" in exp:
        assert cfg["tile"] == exp["tile"] and \
            cfg["tile_overlap"] == exp["tile_overlap"], grlir_exp


def test_sr_patch_semantics():
    """grlir sr patch_size is the LR patch; reference patch 256 = GT crop at x4."""
    cfg = load_config(["experiment=sr/grl_p256"])
    ref = _load("experiment/sr/grl/grl_p256.yaml")
    assert cfg["patch_size"] * cfg["data_module"]["scale"] == ref["patch_size"]


def test_bsr_gan_geometry():
    """GAN recipe: generator window 16, stripes 32/64, patch 128, NIQE monitor."""
    cfg = load_config(["experiment=bsr/grl"])
    ref = _load("experiment/bsr/grl.yaml")
    g = cfg["model"]["model_g"]
    rg = ref["model"]["model_g"]
    assert g["window_size"] == rg["window_size"] == 16
    assert g["stripe_size"] == [ref["stripe_size1"], ref["stripe_size2"]]
    assert cfg["patch_size"] == ref["patch_size"] == 128
    assert cfg["model_checkpoint"]["monitor"] == "val_niqe"
    assert cfg["model_checkpoint"]["mode"] == "min"
    assert cfg["data_module"]["train"]["use_usm_pixel"] is True
    assert cfg["data_module"]["train"]["use_usm_gan"] is False
    assert cfg["data_module"]["val"]["with_gt"] is False
    assert cfg["metric"]["val"] == ["niqe"]


def test_metric_groups_match_reference_sets():
    """Every reference metric group composes; val metric lists mirror the
    reference's torchmetrics selections (config/metric/*.yaml)."""
    want = {
        "restorer": ["psnr", "psnr_y", "ssim", "ssim_y"],
        "restorer_gray": ["psnr", "ssim"],
        "restorer_gray_perceptual": ["psnr", "ssim", "niqe"],
        "restorer_jpeg": ["psnr", "psnr_y", "ssim", "ssim_y", "psnrb", "psnrb_y"],
        "restorer_jpeg_gray": ["psnr", "ssim", "psnrb"],
        "restorer_niqe": ["niqe"],
        "restorer_perceptual": ["psnr", "psnr_y", "ssim", "ssim_y", "lpips",
                                "niqe"],
    }
    for group, metrics in want.items():
        cfg = load_config([f"metric={group}"])
        assert cfg["metric"]["val"] == metrics, group


def test_loss_groups_compose():
    for group, keys in [("ce", {"cross_entropy"}),
                        ("l1_ce", {"l1", "cross_entropy"}),
                        ("l2_ce", {"l2", "cross_entropy"})]:
        cfg = load_config([f"loss={group}"])
        assert set(cfg["loss"]) == keys, group
        assert cfg["classification"] is True, group


def test_lr_scheduler_groups_cover_reference():
    """All 5 reference lr_scheduler groups exist, compose, resolve to a
    registered schedule, and pin the reference group's numeric fields
    (config/lr_scheduler/*.yaml).  multi_steplr group-level milestones are
    deliberately step-based where the reference default is epoch-counts
    ("80+120+140+150"); experiments override them and the experiment-level
    parity is asserted in test_experiment_parity."""
    from grlir.optim.schedules import SCHEDULES

    # grlir group -> (reference file, fields that must match verbatim)
    cases = {
        "steplr": ("steplr.yaml", ["step_size", "gamma"]),
        "multi_steplr": ("multi_steplr.yaml",
                         ["gamma", "warmup_iter", "warmup_init_lr"]),
        "cosine_restart": ("cosine_annealing_restart_cyclic.yaml",
                           ["periods", "restart_weights", "eta_mins"]),
        "cosinelr": ("cosinelr.yaml", ["lr_min", "warmup_lr_init", "warmup_t"]),
        "warmup": ("warmup.yaml", ["eta_min", "multiplier"]),
    }
    ref_files = {c[0] for c in cases.values()}
    import os
    assert ref_files == set(os.listdir(osp.join(REF, "lr_scheduler")))
    for group, (ref_file, fields) in cases.items():
        cfg = load_config([f"lr_scheduler={group}",
                           "trainer.max_steps=300000"])
        sch = cfg["lr_scheduler"]
        assert sch["name"] in SCHEDULES, group
        with open(osp.join(REF, "lr_scheduler", ref_file)) as f:
            ref = yaml.safe_load(f)["lr_scheduler"]
        def _num(v):
            # pyyaml parses bare "1e-5" as a string (YAML 1.1 exponent rule)
            if isinstance(v, str):
                try:
                    return float(v)
                except ValueError:
                    return v
            if isinstance(v, list):
                return [_num(x) for x in v]
            return v

        for field in fields:
            want = _num(ref[field])
            have = sch.get(field, sch.get(
                {"warmup_t": "warmup_steps"}.get(field, field)))
            assert have == pytest.approx(want), (group, field, have, want)
    # warmup group renames: num_epochs/warmup_epochs are steps here
    cfg = load_config(["lr_scheduler=warmup", "trainer.max_steps=300000"])
    assert cfg["lr_scheduler"]["warmup_steps"] == 20000

"""Canonical GRL recipes.

Two families:
  - `final` recipes matching the reference's released-checkpoint sizes
    (grl.py:705-758 __main__): tiny 0.91M / small 3.49M / base 20.13M params.
  - `deployed` config-file recipes (config/model/grl/*.yaml): same trunk but
    stripe_size [8, None], stripe_groups [None, 4], stripe_shift, down-factor 4 —
    the settings the released checkpoints were actually trained with.
"""

from __future__ import annotations

from dataclasses import replace

from grlir.models.grl import GRLConfig

# config/model/grl/grl_tiny.yaml
GRL_TINY = GRLConfig(
    upscale=4,
    in_channels=3,
    embed_dim=64,
    img_range=1.0,
    upsampler="pixelshuffledirect",
    depths=(4, 4, 4, 4),
    num_heads_window=(2, 2, 2, 2),
    num_heads_stripe=(2, 2, 2, 2),
    window_size=8,
    stripe_size=(8, None),
    stripe_groups=(None, 4),
    stripe_shift=True,
    mlp_ratio=2.0,
    qkv_proj_type="linear",
    anchor_proj_type="avgpool",
    anchor_one_stage=True,
    anchor_window_down_factor=4,
    conv_type="1conv",
    local_connection=False,
)

# config/model/grl/grl_small.yaml
GRL_SMALL = replace(GRL_TINY, embed_dim=128, upsampler="pixelshuffle")

# config/model/grl/grl_base.yaml
GRL_BASE = replace(
    GRL_SMALL,
    embed_dim=180,
    depths=(4, 4, 8, 8, 8, 4, 4),
    num_heads_window=(3, 3, 3, 3, 3, 3, 3),
    num_heads_stripe=(3, 3, 3, 3, 3, 3, 3),
    local_connection=True,
)

# config/model/grl/grl_base_bsr.yaml model_g (real-world SR generator)
GRL_BASE_BSR = replace(GRL_BASE, upsampler="nearest+conv")


def make_config(
    name: str,
    task: str = "sr",
    upscale: int = 4,
    in_channels: int = 3,
    **overrides,
) -> GRLConfig:
    """Build a task-adapted config.

    task: sr | dn | jpeg | dm | db | bsr.  Non-SR tasks use the identity tail
    (upsampler "") and upscale 1; jpeg grayscale uses in_channels 1; dn/db may add
    a noise-level-map channel via in_channels=4 like the reference experiments.
    """
    base = {"tiny": GRL_TINY, "small": GRL_SMALL, "base": GRL_BASE}[name]
    cfg = base
    if task in ("dn", "jpeg", "dm", "db", "paired"):
        cfg = replace(cfg, upsampler="", upscale=1,
                      in_channels=in_channels, out_channels=3 if task == "dm" else None)
    elif task == "bsr":
        cfg = replace(cfg, upsampler="nearest+conv", upscale=4)
    elif task == "sr":
        cfg = replace(cfg, upscale=upscale, in_channels=in_channels)
    else:
        raise ValueError(f"unknown task {task}")
    if overrides:
        cfg = replace(cfg, **overrides)
    return cfg

"""GRL network: image restoration transformer with global/regional/local modelling.

TPU-native re-design of the reference GRL (/root/reference/models/networks/grl.py:176):
NHWC throughout, geometry precomputed on host per padded shape (grl.py:309-310,431-453
becomes `GRLConfig.geometry(x_size)` + an LRU cache), reconstruction tails expressed as
reshape-based pixel shuffles, and `jax.checkpoint` per block instead of fairscale's
checkpoint_wrapper.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grlir.models.blocks import (
    ConvIO,
    EfficientMixAttnTransformerBlock,
    PermutedOutConv,
    conv2d,
    dense,
    layer_norm,
)
from grlir.ops.geometry import GeometryConfig, build_geometry_compact
from grlir.ops.layout import (nearest_upsample, pad_to_multiple,
                              pixel_shuffle_jic, shuffle_channel_perm)

Size2 = Tuple[int, int]

# Fixed DIV2K RGB mean (grl.py:267-271).
RGB_MEAN = (0.4488, 0.4371, 0.4040)


def resolve_pallas_mode(mode, deterministic: bool = True):
    """'auto' -> 'v3' on TPU inference, False everywhere else.

    Inference (deterministic=True): 'v3' is a measured whole-model win on
    TPU hardware (tools/bench_v3.py), False off-TPU (CPU runs Pallas in slow
    interpret mode).  Training (deterministic=False): the v3 custom VJP
    recomputes the full XLA forward inside the backward
    (ops/pallas/block_attn.py:_window_half_fn), so a v3 train step pays
    v3-fwd + XLA-fwd + XLA-bwd — measured 46.6 vs 29.9 ms/step (GRL-S bs8,
    round 4/5) — hence 'auto' resolves to False for training traces.
    Explicit modes (True/'v3'/'window'/...) are always honored as given."""
    if mode == "auto":
        if deterministic and jax.default_backend() == "tpu":
            return "v3"
        return False
    return mode


@dataclass(frozen=True)
class GRLConfig:
    """Static hyperparameters of a GRL network (grl.py:220-256)."""

    in_channels: int = 3
    out_channels: Optional[int] = None
    embed_dim: int = 96
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""  # pixelshuffle | pixelshuffledirect | nearest+conv | ""
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads_window: Tuple[int, ...] = (3, 3, 3, 3, 3, 3)
    num_heads_stripe: Tuple[int, ...] = (3, 3, 3, 3, 3, 3)
    window_size: int = 8
    stripe_size: Tuple[Optional[int], Optional[int]] = (8, 8)
    stripe_groups: Tuple[Optional[int], Optional[int]] = (None, None)
    stripe_shift: bool = False
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qkv_proj_type: str = "linear"
    # "linear" | "conv2d": ablation-only 3x3-conv output projection
    # (mixed_attn_block.py:892-895; no shipped reference config sets it)
    out_proj_type: str = "linear"
    anchor_proj_type: str = "avgpool"
    anchor_one_stage: bool = True
    anchor_window_down_factor: int = 1
    local_connection: bool = False
    drop_path_rate: float = 0.1
    conv_type: str = "1conv"
    init_method: str = "n"
    separable_conv_act: bool = True
    euclidean_dist: bool = False
    double_window: bool = False
    stripe_square: bool = False
    # log-CPB table normalization anchors (grl.py:52-53 — the reference marks
    # these "actually not used" and never sets them; plumbed for parity)
    pretrained_window_size: Tuple[int, int] = (0, 0)
    pretrained_stripe_size: Tuple[int, int] = (0, 0)
    # fused Pallas attention kernels (forward/inference path; TPU only):
    # "auto" | False | True (both halves) | "window" | "stripe" | "v3".
    # "auto" (default) resolves to "v3" on TPU backends for INFERENCE traces
    # (deterministic=True) — measured whole-model win on hardware (GRL-S x4
    # bf16: 2.73->3.09 MP/s at 256², 2.44->3.04 at 384²; tools/bench_v3.py)
    # with VMEM-guarded fallback to the XLA cm path at unsupported
    # geometries — and to False for training traces (the kernels' custom VJP
    # recomputes the XLA forward in the backward; see resolve_pallas_mode)
    # and off-TPU (interpret mode is slow).
    use_pallas_attention: object = "auto"
    # Attention operand layout.  "dn" (default) keeps attention operands
    # token-minor (B, nW, h, d, N) and — critically — splits heads AFTER a
    # channel-major transpose, so no intermediate ever has trailing dims
    # smaller than the (16, 128) TPU tile.  The torch-like "nd" order
    # materializes a (..., 3, heads, head_dim) intermediate whose trailing
    # (2, 32) dims pad 32x, costing ~13% whole-model throughput (measured
    # 1.80 vs 1.59 MP/s, GRL-S x4 384² bf16).  Numerics identical.
    attn_layout: str = "dn"  # "dn" (token-minor) | "nd" (torch-like)
    # Attention boundary handling.  "cm" (default) fuses the window/stripe
    # partition with the channel-major conversion (one copy instead of two)
    # and slices the shared qkv projection per half so roll/partition touch
    # the C-wide block input instead of the 1.5C-wide qkv, with head
    # split/merge as free channel-major reshapes.  Numerics identical
    # (golden-tested); measured +8% inference throughput (GRL-S x4 256² bf16:
    # 2.40 vs 2.23 MP/s).  Falls back to "legacy" automatically for conv qkv
    # projections and the ablation attention branches.
    attn_io: str = "cm"  # "cm" | "legacy"
    num_out_feats: int = 64
    # Physical layout of the upscaling tail's final conv.  "cmajor" emits
    # conv_last channel-major ((N, C, 4H, 4W): trailing dims unpadded) and
    # transposes logically at the very end — the NHWC C=3-minor form pads
    # 43x under TPU lane tiling (~0.5 GB padded per 1024² frame, post-v3
    # HLO audit).  Params and outputs are identical; only intermediate
    # layout differs.  Applies to the pixelshuffle/nearest+conv tails.
    tail_layout: str = "nhwc"  # "nhwc" | "cmajor"
    remat: bool = False  # jax.checkpoint each transformer block
    # jax.checkpoint policy when remat is on: None = recompute everything
    # ("nothing_saveable"); "dots" saves matmul outputs (recompute only the
    # cheap elementwise/layout ops — measured middle ground between blanket
    # remat's 1.3-2.3x cost and no-remat's memory footprint)
    remat_policy: Optional[str] = None  # None | "dots" | "dots_no_batch"
    # computation dtype ("float32" | "bfloat16"); params always float32
    dtype: str = "float32"

    @property
    def resolved_out_channels(self) -> int:
        return self.out_channels or self.in_channels

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def geometry_config(self) -> GeometryConfig:
        return GeometryConfig(
            window_size=(self.window_size, self.window_size),
            stripe_size=tuple(self.stripe_size),
            stripe_groups=tuple(self.stripe_groups),
            anchor_window_down_factor=self.anchor_window_down_factor,
            pretrained_window_size=tuple(self.pretrained_window_size),
            pretrained_stripe_size=tuple(self.pretrained_stripe_size),
        )

    @property
    def pad_size(self) -> int:
        return self.geometry_config.pad_size

    def geometry(self, x_size: Size2) -> Dict[str, np.ndarray]:
        """Host-side compact geometry for one padded resolution (cached).

        Masks come factorized as band maps (see build_geometry_compact) so the
        traced program embeds KBs, not the dense (nW, N, N) masks."""
        return _cached_geometry(self.geometry_config, x_size)


@functools.lru_cache(maxsize=64)
def _cached_geometry(gcfg: GeometryConfig, x_size: Size2):
    return build_geometry_compact(gcfg, x_size)


def _inflate_mask(bands_q, bands_k, dtype=jnp.float32):
    """(nW, N1) x (nW, N2) band maps -> (nW, N1, N2) additive {0, MASK_NEG}
    mask, computed on device (geometry.py calculate_mask/_all semantics).
    Emitted in the compute dtype ({0, -100} is exact in bf16) so the per-use
    reads cost half under bf16."""
    diff = bands_q[:, :, None] != bands_k[:, None, :]
    return jnp.where(diff, jnp.asarray(-100.0, dtype), jnp.asarray(0.0, dtype))


class LastConv3(nn.Module):
    """3conv variant of the pre-residual conv block (swin_v1_block.py:471-479)."""

    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = conv2d(x, self.dim // 4, (3, 3), name="conv1", dtype=self.dtype)
        x = nn.leaky_relu(x, 0.2)
        x = conv2d(x, self.dim // 4, (1, 1), name="conv2", dtype=self.dtype)
        x = nn.leaky_relu(x, 0.2)
        return conv2d(x, self.dim, (3, 3), name="conv3", dtype=self.dtype)


def last_conv(x, conv_type: str, dim: int, *, name: str, dtype=None):
    """Conv block before residual connection (swin_v1_block.py:469-485)."""
    if conv_type == "1conv":
        return conv2d(x, dim, (3, 3), name=name, dtype=dtype)
    if conv_type == "1conv1x1":
        return conv2d(x, dim, (1, 1), name=name, dtype=dtype)
    if conv_type == "linear":
        return dense(x, dim, name=name, dtype=dtype)
    if conv_type == "3conv":
        return LastConv3(dim, dtype=dtype, name=name)(x)
    raise ValueError(conv_type)


class TransformerStage(nn.Module):
    """Stack of mixed-attention blocks + conv with outer residual (grl.py:31-173).

    Block schedule: window shift on even blocks, H stripes on even / W (vertical)
    stripes on odd blocks, stripe shift on blocks i%4 in {2,3} (grl.py:112-116).
    """

    cfg: GRLConfig
    depth: int
    num_heads_w: int
    num_heads_s: int
    drop_path_rates: Tuple[float, ...]

    @nn.compact
    def __call__(self, x, geometry, deterministic: bool = True):
        cfg = self.cfg
        if cfg.remat:
            policies = {
                None: None,  # nothing_saveable: full recompute
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }
            block_cls = nn.remat(
                EfficientMixAttnTransformerBlock,
                policy=policies[cfg.remat_policy],
            )
        else:
            block_cls = EfficientMixAttnTransformerBlock
        res = x
        for i in range(self.depth):
            block = block_cls(
                dim=cfg.embed_dim,
                num_heads_w=self.num_heads_w,
                num_heads_s=self.num_heads_s,
                window_size=(cfg.window_size, cfg.window_size),
                window_shift=i % 2 == 0,
                stripe_size_cfg=tuple(cfg.stripe_size),
                stripe_groups_cfg=tuple(cfg.stripe_groups),
                stripe_type="H" if i % 2 == 0 else "W",
                stripe_shift=(i % 4 in (2, 3)) if cfg.stripe_shift else False,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qkv_proj_type=cfg.qkv_proj_type,
                anchor_proj_type=cfg.anchor_proj_type,
                anchor_one_stage=cfg.anchor_one_stage,
                anchor_window_down_factor=cfg.anchor_window_down_factor,
                drop_path_rate=self.drop_path_rates[i],
                res_scale=0.1 if cfg.init_method == "r" else 1.0,
                local_connection=cfg.local_connection,
                separable_conv_act=cfg.separable_conv_act,
                euclidean_dist=cfg.euclidean_dist,
                double_window=cfg.double_window,
                stripe_square=cfg.stripe_square,
                use_pallas=resolve_pallas_mode(cfg.use_pallas_attention,
                                               deterministic),
                d_major=cfg.attn_layout == "dn",
                attn_io=cfg.attn_io,
                out_proj_type=cfg.out_proj_type,
                deterministic=deterministic,
                dtype=cfg.compute_dtype,
                name=f"blocks_{i}",
            )
            res = block(res, geometry)
        res = last_conv(res, cfg.conv_type, cfg.embed_dim, name="conv",
                        dtype=cfg.compute_dtype)
        return res + x


class GRL(nn.Module):
    """GRL restoration transformer (grl.py:176-551).  Input/output NHWC in [0, 1]."""

    cfg: GRLConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        B, H, W, _ = x.shape
        x = pad_to_multiple(x, cfg.pad_size)

        if cfg.in_channels == 3:
            mean = jnp.asarray(RGB_MEAN, x.dtype).reshape(1, 1, 1, 3)
        else:
            mean = jnp.zeros((1, 1, 1, 1), x.dtype)
        x = (x - mean) * cfg.img_range

        raw = cfg.geometry((x.shape[1], x.shape[2]))
        geometry = {
            k: jnp.asarray(v) for k, v in raw.items()
            if not k.startswith("bands_")
        }
        # dense masks inflated on device from the tiny band maps (unused masks
        # are DCE'd when the corresponding shift is off)
        bw = jnp.asarray(raw["bands_w"])
        geometry["mask_w"] = _inflate_mask(bw, bw, cfg.compute_dtype)
        geometry["bands_w"] = bw  # fused kernels build the mask in-kernel
        for s in ("sh", "sv"):
            b = jnp.asarray(raw[f"bands_{s}"])
            ba = jnp.asarray(raw[f"bands_{s}_a"])
            geometry[f"mask_{s}_a2w"] = _inflate_mask(ba, b, cfg.compute_dtype)
            geometry[f"mask_{s}_w2a"] = _inflate_mask(b, ba, cfg.compute_dtype)
            # flash kernels rebuild the mask in-kernel from the band maps
            geometry[f"bands_{s}"] = b
            geometry[f"bands_{s}_a"] = ba

        def features(feat):
            feat = layer_norm(feat, name="norm_start")
            dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
            for i, depth in enumerate(cfg.depths):
                feat = TransformerStage(
                    cfg,
                    depth,
                    cfg.num_heads_window[i],
                    cfg.num_heads_stripe[i],
                    tuple(dpr[sum(cfg.depths[:i]): sum(cfg.depths[: i + 1])]),
                    name=f"layers_{i}",
                )(feat, geometry, deterministic)
            return layer_norm(feat, name="norm_end")

        def body(feat):
            return last_conv(features(feat), cfg.conv_type, cfg.embed_dim,
                             name="conv_after_body",
                             dtype=cfg.compute_dtype) + feat

        out_ch = cfg.resolved_out_channels
        nf = cfg.num_out_feats
        cmajor_out = False

        if cfg.upsampler == "pixelshuffle":
            x = conv2d(x, cfg.embed_dim, name="conv_first", dtype=cfg.compute_dtype)
            x = body(x)
            x = nn.leaky_relu(conv2d(x, nf, name="conv_before_upsample", dtype=cfg.compute_dtype), 0.01)
            # Upsample: conv+shuffle per factor-2 step (upsample.py:6-30)
            scale = cfg.upscale
            if (scale & (scale - 1)) == 0:
                for i in range(int(math.log2(scale))):
                    x = PermutedOutConv(
                        4 * nf, tuple(shuffle_channel_perm(nf, 2)),
                        dtype=cfg.compute_dtype, name=f"upsample_{i}")(x)
                    x = pixel_shuffle_jic(x, 2)
            elif scale == 3:
                x = PermutedOutConv(
                    9 * nf, tuple(shuffle_channel_perm(nf, 3)),
                    dtype=cfg.compute_dtype, name="upsample_0")(x)
                x = pixel_shuffle_jic(x, 3)
            else:
                raise ValueError(f"unsupported scale {scale}")
            if cfg.tail_layout == "cmajor":
                x = ConvIO(out_ch, ("NHWC", "HWIO", "NCHW"),
                           dtype=cfg.compute_dtype, name="conv_last")(x)
                cmajor_out = True
            else:
                x = conv2d(x, out_ch, name="conv_last",
                           dtype=cfg.compute_dtype)
        elif cfg.upsampler == "pixelshuffledirect":
            x = conv2d(x, cfg.embed_dim, name="conv_first", dtype=cfg.compute_dtype)
            x = body(x)
            x = PermutedOutConv(
                cfg.upscale**2 * out_ch,
                tuple(shuffle_channel_perm(out_ch, cfg.upscale)),
                dtype=cfg.compute_dtype, name="upsample_0")(x)
            x = pixel_shuffle_jic(x, cfg.upscale)
        elif cfg.upsampler == "nearest+conv":
            assert cfg.upscale == 4, "nearest+conv tail supports x4 only"
            x = conv2d(x, cfg.embed_dim, name="conv_first", dtype=cfg.compute_dtype)
            x = body(x)
            x = nn.leaky_relu(conv2d(x, nf, name="conv_before_upsample", dtype=cfg.compute_dtype), 0.01)
            x = nn.leaky_relu(
                conv2d(nearest_upsample(x, 2), nf, name="conv_up1", dtype=cfg.compute_dtype), 0.2)
            x = nn.leaky_relu(
                conv2d(nearest_upsample(x, 2), nf, name="conv_up2", dtype=cfg.compute_dtype), 0.2)
            x = nn.leaky_relu(
                conv2d(x, nf, name="conv_hr", dtype=cfg.compute_dtype), 0.2)
            if cfg.tail_layout == "cmajor":
                x = ConvIO(out_ch, ("NHWC", "HWIO", "NCHW"),
                           name="conv_last")(x)
                cmajor_out = True
            else:
                x = conv2d(x, out_ch, name="conv_last")
        else:
            # denoising / JPEG artifact removal tail (grl.py:540-547)
            res = body(conv2d(x, cfg.embed_dim, name="conv_first", dtype=cfg.compute_dtype))
            if cfg.in_channels == out_ch:
                x = x + conv2d(res, out_ch, name="conv_last", dtype=cfg.compute_dtype)
            else:
                x = conv2d(res, out_ch, name="conv_last", dtype=cfg.compute_dtype)

        if cmajor_out:
            # fp32 epilogue in the unpadded channel-major layout; the final
            # logical NHWC transpose fuses into the consumer (or becomes the
            # jit output's layout — either way the padded NHWC form is never
            # written at full resolution)
            x = (x.astype(jnp.float32) / cfg.img_range
                 + jnp.transpose(mean.astype(jnp.float32), (0, 3, 1, 2)))
            x = x[:, :, : H * cfg.upscale, : W * cfg.upscale]
            return jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(jnp.float32) / cfg.img_range + mean.astype(jnp.float32)
        return x[:, : H * cfg.upscale, : W * cfg.upscale, :]


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

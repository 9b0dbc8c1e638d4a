"""PyTorch checkpoint -> JAX parameter conversion for GRL.

Maps the reference's state_dict names (models/networks/grl.py module tree) onto
grlir's flax param tree.  Handles the reference's three load paths
(tools/trainer.py:91-115): engine-prefixed Lightning checkpoints (``model.``),
GAN checkpoints (``model_g.`` / ``model_d.``), and raw state_dicts; strips the
stale geometry buffers exactly like ``GRL.convert_checkpoint`` (grl.py:556-569).

Transforms:
  torch Linear   (out, in)       -> flax kernel (in, out)
  torch Conv2d   (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch LayerNorm weight         -> flax scale
  logit_scale                    -> unchanged (heads, 1, 1)
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

# Buffer keys the reference strips on load (grl.py:556-569).
_BUFFER_RE = re.compile(
    r"(relative_coords_table|relative_position_index|attn_mask"
    r"|(^|\.)table_|(^|\.)index_|(^|\.)mask_|(^|\.)mean$"
    r"|current_val_metric|best_val_metric|best_iter)"
)


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Translate one flax param path to the reference torch state_dict key."""
    parts = list(path)
    if parts[0] == "params":
        parts = parts[1:]

    leaf = parts[-1]
    body = parts[:-1]

    out = []
    i = 0
    while i < len(body):
        p = body[i]
        m = re.fullmatch(r"(layers|blocks)_(\d+)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
        elif re.fullmatch(r"upsample_(\d+)", p):
            k = int(p.split("_")[1])
            out.append(f"upsample.up.{2 * k}")
        elif p == "conv_before_upsample":
            # torch: nn.Sequential(conv, lrelu) (grl.py:354-356)
            out.append("conv_before_upsample.0")
        elif p == "anchor" and i + 1 < len(body):
            # AnchorProjection.body is a ModuleList (mixed_attn_block.py:739-785)
            nxt = body[i + 1]
            if nxt == "reduction":  # avgpool/maxpool AnchorLinear
                out.append("anchor.body.0.reduction")
                i += 1
            elif nxt == "body":  # one-stage conv2d/separable/patchmerging
                out.append("anchor.body.0")
                i += 1
            elif re.fullmatch(r"body(\d+)", nxt):  # multi-stage
                out.append(f"anchor.body.{nxt[4:]}")
                i += 1
            else:
                out.append(p)
        elif p == "cpb_mlp":
            # torch CPB_MLP is Sequential [linear, relu, linear]
            nxt = body[i + 1]
            out.append("cpb_mlp.0" if nxt == "fc1" else "cpb_mlp.2")
            i += 1
        elif p == "cab0":
            out.append("cab.0")
        elif p == "cab2":
            out.append("cab.2")
        elif p == "ca":
            # ChannelAttention.attention = Sequential(pool, conv, relu, conv, sigmoid)
            sub = body[i + 1]
            out.append("cab.3.attention.1" if sub == "fc1" else "cab.3.attention.3")
            i += 1
        elif p in ("conv1", "conv2", "conv3"):
            # 3conv LastConv: Sequential [conv, lrelu, conv, lrelu, conv]
            out.append(str({"conv1": 0, "conv2": 2, "conv3": 4}[p]))
        elif p == "depthwise":
            # SeparableConv Sequential: [depthwise, GELU, pointwise]
            out.append("0")
        elif p == "pointwise":
            out.append("2")
        else:
            out.append(p)
        i += 1

    key = ".".join(out)
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "logit_scale": "logit_scale"}[leaf]
    return f"{key}.{suffix}" if key else suffix


def _to_flax(torch_arr: np.ndarray, leaf: str, flax_shape) -> np.ndarray:
    a = np.asarray(torch_arr)
    if leaf == "kernel":
        if a.ndim == 2:
            a = a.T
        elif a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {a.shape} vs flax {flax_shape}")
    return a


def strip_prefix(state_dict: Mapping[str, np.ndarray], prefix: str = "model."):
    """Select keys under a prefix (``model.`` / ``model_g.`` / ``model_d.``) and
    drop geometry/metric buffers."""
    out = {}
    for k, v in state_dict.items():
        if prefix and not k.startswith(prefix):
            continue
        k2 = k[len(prefix):] if prefix else k
        if _BUFFER_RE.search(k2) or _BUFFER_RE.search(k):
            continue
        out[k2] = v
    return out


def convert_torch_state_dict(state_dict: Mapping[str, np.ndarray], params) -> dict:
    """Fill the flax param tree `params` from a (prefix-stripped) torch state_dict.

    Raises on any missing torch key or shape mismatch; reports torch keys that
    were present but never consumed (excluding known buffers).
    """
    flat = _flatten(params)
    used = set()
    out = {}
    for path, value in flat.items():
        tkey = flax_path_to_torch_key(path)
        if tkey not in state_dict and "pointwise" in path:
            # SeparableConv without GELU (reference's effective default through
            # the efficient GRL): Sequential indices are [0, 1] not [0, 2]
            alt = tkey.replace(".2.weight", ".1.weight").replace(
                ".2.bias", ".1.bias")
            if alt in state_dict:
                tkey = alt
        if tkey not in state_dict:
            raise KeyError(f"torch key {tkey!r} (for flax {'/'.join(path)}) missing")
        # `value` may be a concrete array or a jax.ShapeDtypeStruct template
        out[path] = _to_flax(state_dict[tkey], path[-1], value.shape).astype(
            value.dtype
        )
        used.add(tkey)

    unused = [k for k in state_dict if k not in used and not _BUFFER_RE.search(k)]
    if unused:
        raise ValueError(f"unconsumed torch keys: {unused[:10]}{'...' if len(unused) > 10 else ''}")
    return _unflatten(out)


def load_torch_checkpoint(path: str):
    """Load a .ckpt/.pth file to a {name: np.ndarray} dict (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def convert_unet_discriminator(state_dict: Mapping[str, np.ndarray],
                               variables) -> dict:
    """torch UNetDiscriminatorSN state_dict -> flax variables for
    grlir.models.discriminator.UNetDiscriminatorSN.

    torch spectral_norm stores `weight_orig` + power-iteration vectors
    `weight_u`/`weight_v`; plain convs (conv0/conv9) store `weight`/`bias`
    (discriminator.py:92-117).
    """
    flat = _flatten(variables)
    out = {}
    used = set()
    for path, value in flat.items():
        coll, name, leaf = path[0], path[1], path[-1]
        if coll == "params":
            if leaf == "kernel":
                for cand in (f"{name}.weight", f"{name}.weight_orig"):
                    if cand in state_dict:
                        break
                else:
                    raise KeyError(f"missing {name}.weight[_orig]")
                arr = np.asarray(state_dict[cand]).transpose(2, 3, 1, 0)
                used.add(cand)
            else:
                arr = np.asarray(state_dict[f"{name}.bias"])
                used.add(f"{name}.bias")
        elif coll == "spectral":
            arr = np.asarray(state_dict[f"{name}.weight_u"])
            used.add(f"{name}.weight_u")
        else:
            raise KeyError(f"unexpected collection {coll}")
        if tuple(arr.shape) != tuple(value.shape):
            raise ValueError(f"{path}: {arr.shape} vs {value.shape}")
        out[path] = arr.astype(value.dtype)
    return _unflatten(out)


def load_gan_checkpoint(path: str, gen_template, disc_variables_template):
    """Split a GAN checkpoint into generator params + discriminator variables
    (engines/base_gan.py:48-84 load paths)."""
    sd = load_torch_checkpoint(path)
    gen = convert_torch_state_dict(strip_prefix(sd, "model_g."), gen_template)
    disc_sd = strip_prefix(sd, "model_d.")
    disc = (convert_unet_discriminator(disc_sd, disc_variables_template)
            if disc_sd else None)
    return gen, disc


def main(argv=None):
    """CLI: convert a released PyTorch checkpoint to a flax msgpack file.

    python -m grlir.utils.convert ckpt.ckpt out.msgpack \
        --model tiny|small|base --task sr|dn|jpeg|dm|db|bsr [--scale 4]
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("output")
    ap.add_argument("--model", default="small",
                    choices=["tiny", "small", "base"])
    ap.add_argument("--task", default="sr")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--in-channels", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from grlir.models import zoo
    from grlir.models.grl import GRL

    cfg = zoo.make_config(args.model, task=args.task, upscale=args.scale,
                          in_channels=args.in_channels)
    model = GRL(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32),
    )
    sd = load_torch_checkpoint(args.checkpoint)
    for prefix in ("model.", "model_g.", ""):
        stripped = strip_prefix(sd, prefix)
        if not stripped:
            continue
        try:
            params = convert_torch_state_dict(stripped, template)
            break
        except KeyError:
            continue
    else:
        raise SystemExit("checkpoint does not match the model parameter tree")

    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(int(np.prod(v.shape)) for v in _flatten(params).values())
    print(f"wrote {args.output} ({n/1e6:.3f}M params)")


if __name__ == "__main__":
    main()

"""Batch inference CLI: restore a folder of images with a (converted) checkpoint.

    python -m grlir.serve --input lr_dir --output out_dir \
        --checkpoint sr_grl_small_c3x4.ckpt --model small --task sr --scale 4 \
        [--tile 640 --tile-overlap 32] [--shape-bucket 64] [--dtype bfloat16]

Accepts released PyTorch .ckpt files (converted on the fly), flax .msgpack files
(from `python -m grlir.utils.convert`), or grlir orbax checkpoint directories.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time


def load_any_checkpoint(path: str, template):
    """torch .ckpt / flax .msgpack / orbax dir -> flax params."""
    path = osp.expanduser(path)
    if osp.isdir(path):  # orbax checkpoint dir (TrainState or bare params)
        from grlir.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        state = mgr.restore_params_only(template)
        mgr.close()
        return state
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    from grlir.train import load_pretrained

    return load_pretrained(template, path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="input image file or dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="small", choices=["tiny", "small", "base"])
    ap.add_argument("--task", default="sr")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--tile", type=int, default=0)
    ap.add_argument("--tile-overlap", type=int, default=32)
    ap.add_argument("--shape-bucket", type=int, default=64,
                    help="whole-image mode: pad H/W up to multiples of this "
                         "so assorted sizes share compiled programs (0=off)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from grlir.engines.inference import Restorer
    from grlir.models import zoo
    from grlir.models.grl import GRL
    from grlir.utils.image import to_uint8

    cfg = zoo.make_config(args.model, task=args.task, upscale=args.scale)
    cfg = replace(cfg, dtype=args.dtype)
    model = GRL(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32))
    params = load_any_checkpoint(args.checkpoint, template)

    scale = cfg.upscale
    restorer = Restorer(lambda p, x: model.apply(p, x), params, scale=scale,
                        tile=args.tile, tile_overlap=args.tile_overlap,
                        shape_bucket=args.shape_bucket)

    paths = ([args.input] if osp.isfile(args.input) else sorted(
        osp.join(args.input, f) for f in os.listdir(args.input)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))))
    os.makedirs(args.output, exist_ok=True)

    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        x = img.astype(np.float32)[None] / 255.0
        t0 = time.time()
        out = restorer(x)[0]
        dt = time.time() - t0
        dst = osp.join(args.output, osp.basename(p))
        cv2.imwrite(dst, cv2.cvtColor(to_uint8(out), cv2.COLOR_RGB2BGR))
        print(f"{osp.basename(p)}: {img.shape[1]}x{img.shape[0]} -> "
              f"{out.shape[1]}x{out.shape[0]} in {dt:.2f}s -> {dst}")


if __name__ == "__main__":
    main()

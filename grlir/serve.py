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
    ap.add_argument("--batch", type=int, default=1,
                    help="restore up to N same-bucket images per device "
                         "dispatch (whole-image mode)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--pallas", default="auto",
                    choices=["auto", "off", "on", "window", "stripe", "v3"],
                    help="Pallas attention engines (auto = v3 on TPU, off "
                         "elsewhere; v3 = whole-block-half kernels; "
                         "unsupported geometries fall back to XLA "
                         "automatically)")
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
    cfg = replace(cfg, use_pallas_attention=(
        {"off": False, "on": True}.get(args.pallas, args.pallas)))
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

    # group same-bucket images into batches: one device dispatch restores
    # up to --batch images (dispatch overhead amortizes; shapes stay static)
    def bucket_key(shape):
        m = args.shape_bucket
        if not m or args.tile:
            return shape
        return (-(-shape[0] // m) * m, -(-shape[1] // m) * m)

    imgs = []
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        imgs.append((p, img))

    groups = {}
    for p, img in imgs:
        groups.setdefault(bucket_key(img.shape[:2]), []).append((p, img))

    for key, members in groups.items():
        for s in range(0, len(members), max(args.batch, 1)):
            chunk = members[s: s + max(args.batch, 1)]
            # pad each member straight to the group's canonical shape in ONE
            # reflect (identical to the single-image bucketed path) — global
            # stripe attention sees the pad content, so double-padding would
            # change outputs everywhere, not just at borders
            if args.shape_bucket and not args.tile:
                hmax, wmax = key
            else:
                hmax = max(im.shape[0] for _, im in chunk)
                wmax = max(im.shape[1] for _, im in chunk)
            from grlir.engines.inference import reflect_pad_to

            batch = np.stack([
                reflect_pad_to(im.astype(np.float32) / 255.0, (hmax, wmax))
                for _, im in chunk
            ])
            t0 = time.time()
            outs = restorer(batch)
            dt = time.time() - t0
            for i, (p, im) in enumerate(chunk):
                out = outs[i, : im.shape[0] * scale, : im.shape[1] * scale]
                dst = osp.join(args.output, osp.basename(p))
                cv2.imwrite(dst, cv2.cvtColor(to_uint8(out), cv2.COLOR_RGB2BGR))
                print(f"{osp.basename(p)}: {im.shape[1]}x{im.shape[0]} -> "
                      f"{out.shape[1]}x{out.shape[0]} in {dt/len(chunk):.2f}s"
                      f" -> {dst}")


if __name__ == "__main__":
    main()

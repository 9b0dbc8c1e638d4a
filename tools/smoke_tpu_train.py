"""End-to-end training smoke ON THE REAL CHIP through the CLI surface.

Builds a synthetic GRLIR_DATA_ROOT (DIV2K-style train + CBSD68-style val),
then runs `grlir.train.main` — config composition, on-device degradation,
train steps, validation, checkpointing, resume — on whatever accelerator
the environment provides (the axon TPU here; tests force CPU, this tool
deliberately does not).  Prints one JSON line.

Usage: python tools/smoke_tpu_train.py [--steps 20] [--embed 32]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_root(root):
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    div2k = os.path.join(root, "DIV2K", "train")
    os.makedirs(div2k)
    train_list = []
    for i in range(8):
        name = f"{i:04d}.png"
        img = (rng.random((96, 112, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(div2k, name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        train_list.append({"path": f"train/{name}"})
    info = os.path.join(root, "image_info", "DIV2K")
    os.makedirs(info)
    with open(os.path.join(info, "train.json"), "w") as f:
        json.dump(train_list, f)

    test_dir = os.path.join(root, "test_set", "CBSD68")
    os.makedirs(test_dir)
    val_list = []
    for i in range(2):
        name = f"val{i}.png"
        img = (rng.random((72, 80, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(test_dir, name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        val_list.append({"path": f"CBSD68/{name}"})
    info2 = os.path.join(root, "image_info", "CBSD68")
    os.makedirs(info2)
    with open(os.path.join(info2, "test.json"), "w") as f:
        json.dump(val_list, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--embed", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GRLIR_JAX_CACHE",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tmp = tempfile.mkdtemp(prefix="grlir_tpu_smoke_")
    make_root(os.path.join(tmp, "data"))
    os.environ["GRLIR_DATA_ROOT"] = os.path.join(tmp, "data")
    os.environ["GRLIR_CACHE_DIR"] = os.path.join(tmp, "cache")

    from grlir.train import main as train_main

    overrides = [
        "experiment=dn/grl_p256",
        "tag=tpusmoke",
        f"io.base_output_path={tmp}/out",
        "data_module.train.dataset=div2k",
        "data_module.val.dataset=cbsd68",
        f"model.embed_dim={args.embed}",
        "model.depths=[2,2]",
        "model.num_heads_window=[2,2]",
        "model.num_heads_stripe=[2,2]",
        "model.window_size=8",
        "model.stripe_size=[8,8]",
        "model.stripe_groups=[null,null]",
        "patch_size=32",
        "batch_size=2",
        "dtype=bfloat16",
        f"trainer.max_steps={args.steps}",
        f"trainer.val_check_interval={max(2, args.steps // 2)}",
        "trainer.log_every_n_steps=1",
        "num_workers=1",
        "num_devices=1",
        "mixup=false",
        "save_images=false",
    ]
    t0 = time.perf_counter()
    train_main(overrides)
    dt = time.perf_counter() - t0

    out_dir = os.path.join(tmp, "out")
    scalars = []
    for dirpath, _dirs, files in os.walk(out_dir):
        for fn in files:
            if fn == "metrics.jsonl":
                with open(os.path.join(dirpath, fn)) as f:
                    scalars = [json.loads(l) for l in f if l.strip()]
    losses = [s["loss"] for s in scalars if "loss" in s]
    vals = [s for s in scalars if any(k.startswith("val_") for k in s)]
    ckpts = []
    for dirpath, dirs, _files in os.walk(out_dir):
        ckpts += [d for d in dirs if d.isdigit()]
    print(json.dumps({
        "metric": "tpu_train_smoke",
        "backend": jax.default_backend(),
        "steps": args.steps,
        "wall_s": round(dt, 1),
        "first_loss": round(losses[0], 4) if losses else None,
        "last_loss": round(losses[-1], 4) if losses else None,
        "val_records": len(vals),
        "checkpoints": sorted(set(ckpts)),
        "ok": bool(losses) and losses[-1] < losses[0] * 1.5,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fetch + verify the external artifacts the parity pipeline needs.

The sandbox this framework was built in has zero network egress, so the
operational parity definition — "within 0.01 dB of the released reference
checkpoints" (BASELINE.md; /root/reference/scripts/grl/grl_test.md:8-142) —
could never be executed there.  This script makes it a one-command job the
moment a networked machine runs it:

    python tools/fetch_artifacts.py --dest artifacts            # everything
    python tools/fetch_artifacts.py --dest artifacts --only vgg19,checkpoints
    python tools/fetch_artifacts.py --dest artifacts --verify-only

It downloads released GRL checkpoints, the torchvision VGG weights and the
LPIPS linear calibration, verifies sha256 (torch-zoo filenames embed the
8-hex prefix; other hashes are recorded into SHA256SUMS on first fetch and
enforced after), converts the LPIPS weights to the npz the native metric
consumes, and prints the env exports that light up the gated tests
(tests/test_external_artifacts.py) and tools/parity_table.py.

Benchmark datasets have no single canonical URL; --list-data prints the
sources and the expected layout under $GRLIR_DATA_ROOT.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import os.path as osp
import sys
import urllib.request

GRL_RELEASE = ("https://github.com/ofsoundof/GRL-Image-Restoration/"
               "releases/download/v1.0.0/")

# every released checkpoint named in scripts/grl/grl_test.md:8-142
CKPTS = (
    ["dm_grl_small.ckpt", "bsr_grl_base.ckpt",
     "db_defocus_single_pixel_grl_base.ckpt",
     "db_defocus_dual_pixel_grl_base.ckpt",
     "db_motion_grl_base_gopro.ckpt",
     "db_motion_grl_base_realblur_j.ckpt",
     "db_motion_grl_base_realblur_r.ckpt"]
    + [f"dn_grl_{m}_c{c}s{s}.ckpt"
       for m in ("tiny", "small", "base") for c in (1, 3) for s in (15, 25, 50)]
    + [f"sr_grl_{m}_c3x{s}.ckpt"
       for m in ("tiny", "small", "base") for s in (2, 3, 4)]
    + [f"jpeg_grl_{m}_c{c}q{q}.ckpt"
       for m in ("tiny", "small", "base") for c in (1, 3)
       for q in (10, 20, 30, 40)]
)

# (relative dest, url, sha256 — None = record-on-first-fetch; 8-hex prefixes
# are the torch-zoo filename checksums and are enforced as prefixes)
MANIFEST = {
    "vgg19": [("vgg19-dcbb9e9d.pth",
               "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
               "dcbb9e9d")],
    "vgg16": [("vgg16-397923af.pth",
               "https://download.pytorch.org/models/vgg16-397923af.pth",
               "397923af")],
    "lpips": [("lpips_v0.1_vgg.pth",
               "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
               "lpips/weights/v0.1/vgg.pth",
               None)],
    "checkpoints": [(f"GRL/{n}", GRL_RELEASE + n, None) for n in CKPTS],
}

DATASET_NOTES = """\
Benchmark datasets (place under $GRLIR_DATA_ROOT, names as in
grlir/configs/data_module/*; standard IR benchmark distributions):
  set5 set14 bsd100 urban100 manga109   - classical SR (HR pngs; LR via
                                          MATLAB bicubic or x2/x3/x4 subdirs)
  set12 bsd68 cbsd68 kodak24 mcmaster   - denoising
  classic5 live1 bsds500                - JPEG artifact removal
  gopro hide realblur-j realblur-r      - motion deblur (paired blur/sharp)
  dpdd                                  - defocus deblur (single+dual pixel)
  realsr div2k flickr2k ost             - BSR corpora / real-world val
Common mirrors: the BasicSR/KAIR dataset docs, huggingface datasets
(eugenesiow/Set5 etc.), and the original dataset pages.  sha256 of every file
you place can be recorded with --verify-only for reproducibility.
"""


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_sums(path: str) -> dict:
    sums = {}
    if osp.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    digest, name = line.split(maxsplit=1)
                    sums[name.strip()] = digest
    return sums


def save_sums(path: str, sums: dict):
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for name in sorted(sums):
            f.write(f"{sums[name]}  {name}\n")


def fetch(url: str, dest: str) -> bool:
    os.makedirs(osp.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    try:
        print(f"  GET {url}")
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue the sweep
        print(f"  FAILED: {e}")
        if osp.exists(tmp):
            os.remove(tmp)
        return False


def verify(path: str, expected, sums: dict, rel: str) -> bool:
    digest = sha256_file(path)
    if expected and len(expected) == 8:  # torch-zoo filename prefix
        ok = digest.startswith(expected)
    elif expected:
        ok = digest == expected
    elif rel in sums:
        ok = digest == sums[rel]
    else:
        sums[rel] = digest  # first fetch: record
        print(f"  recorded sha256 {digest[:16]}… for {rel}")
        return True
    status = "OK" if ok else f"MISMATCH (got {digest[:16]}…)"
    print(f"  sha256 {status}: {rel}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dest", default="artifacts")
    p.add_argument("--only", default="",
                   help="comma list of groups (default: all): "
                        + ",".join(MANIFEST))
    p.add_argument("--verify-only", action="store_true",
                   help="hash existing files against SHA256SUMS, no network")
    p.add_argument("--list-data", action="store_true")
    args = p.parse_args(argv)

    if args.list_data:
        print(DATASET_NOTES)
        return 0

    groups = [g.strip() for g in args.only.split(",") if g.strip()] or \
        list(MANIFEST)
    sums_path = osp.join(args.dest, "SHA256SUMS")
    sums = load_sums(sums_path)
    failed = []

    for group in groups:
        print(f"[{group}]")
        for rel, url, expected in MANIFEST[group]:
            path = osp.join(args.dest, rel)
            if not osp.exists(path):
                if args.verify_only:
                    print(f"  missing: {rel}")
                    failed.append(rel)
                    continue
                if not fetch(url, path):
                    failed.append(rel)
                    continue
            if not verify(path, expected, sums, rel):
                failed.append(rel)
    save_sums(sums_path, sums)

    # convert LPIPS weights to the native npz when both inputs landed
    lin = osp.join(args.dest, "lpips_v0.1_vgg.pth")
    vgg16 = osp.join(args.dest, "vgg16-397923af.pth")
    npz = osp.join(args.dest, "lpips_vgg.npz")
    if osp.exists(lin) and osp.exists(vgg16) and not osp.exists(npz):
        sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
        from grlir.metrics.lpips import (convert_lpips_torch_weights,
                                         save_lpips_params)
        from grlir.utils.convert import load_torch_checkpoint

        params = convert_lpips_torch_weights(
            load_torch_checkpoint(lin), load_torch_checkpoint(vgg16))
        save_lpips_params(params, npz)
        print(f"converted LPIPS weights -> {npz}")

    d = osp.abspath(args.dest)
    print("\n# environment for the gated tests + parity table:")
    print(f"export GRLIR_VGG19={d}/vgg19-dcbb9e9d.pth")
    print(f"export GRLIR_LPIPS_VGG16={d}/vgg16-397923af.pth")
    print(f"export GRLIR_LPIPS_NPZ={d}/lpips_vgg.npz")
    print(f"export GRLIR_CKPT_DIR={d}/GRL")
    print("export GRLIR_DATA_ROOT=<dataset root>  # see --list-data")
    print("# then: python tools/parity_table.py")
    if failed:
        print(f"\n{len(failed)} artifact(s) missing/failed: "
              + ", ".join(failed[:8]) + ("…" if len(failed) > 8 else ""))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Generate the 0.01-dB accuracy-parity table against released checkpoints.

The operational parity definition (BASELINE.md "Rebuild targets") is: re-run
every released reference checkpoint via the recipes in
/root/reference/scripts/grl/grl_test.md:8-142 and match the reported PSNR
within 0.01 dB.  Checkpoints and benchmark datasets are external artifacts
(zero egress in the build sandbox), so this tool is the one command that
stands between artifact availability and the table:

    python tools/fetch_artifacts.py --dest artifacts   # on a networked box
    export GRLIR_CKPT_DIR=artifacts/GRL GRLIR_DATA_ROOT=<datasets>
    python tools/parity_table.py [--only sr,dn] [--ref ref_results.csv]

For every grl_test.md recipe whose checkpoint (and val data) is present it
runs `python -m grlir.train training=false pretrained_checkpoint=...` with
the verbatim experiment geometry (tests/test_config_parity.py pins those to
the reference tree), collects results.csv, and writes PARITY_TABLE.md.

--ref takes a CSV of reference-produced numbers (columns:
recipe,val_set,psnr[,ssim] — produced by running the reference's own
commands) and adds delta columns + a PASS/FAIL at the 0.01 dB bar.
"""

from __future__ import annotations

import argparse
import csv
import os
import os.path as osp
import subprocess
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

# df=2/w32 geometry + tiling for base models, df=4/default window otherwise —
# exactly the grl_test.md flag pattern (scripts/grl/grl_test.md:31-52,63-80)
_DN_BASE = ["model.anchor_window_down_factor=2", "model.window_size=32",
            "tile=256", "tile_overlap=32"]
_DN_SMALL = ["model.anchor_window_down_factor=4"]
_SR_BASE = ["model.anchor_window_down_factor=2", "tile=0", "tile_overlap=0"]
_SR_SMALL = ["model.anchor_window_down_factor=4", "tile=0", "tile_overlap=0"]

DN_VAL = {1: "set12+bsd68+urban100", 3: "mcmaster+cbsd68+kodak24+urban100"}
JPEG_VAL = {1: "classic5+live1+bsds500+urban100", 3: "live1+bsds500+urban100"}


def recipes():
    """(name, ckpt filename, [cli overrides]) for every released checkpoint."""
    out = []
    # denoising: 3 models x {1,3} channels x {15,25,50} sigma (grl_test.md:19-52)
    for m in ("tiny", "small", "base"):
        geo = _DN_BASE if m == "base" else _DN_SMALL
        for c in (1, 3):
            metric = "restorer_gray" if c == 1 else "restorer"
            for s in (15, 25, 50):
                out.append((f"dn_grl_{m}_c{c}s{s}", f"dn_grl_{m}_c{c}s{s}.ckpt",
                            [f"experiment=dn/grl_p256", f"model=grl/grl_{m}",
                             f"data_module.noise_sigma={s}",
                             f"data_module.num_channels={c}",
                             f"data_module.val.dataset={DN_VAL[c]}",
                             f"metric={metric}"] + geo))
    # classical SR: 3 models x {2,3,4} scale (grl_test.md:55-80); grl_test.md
    # evaluates set5 — sweep the standard 5-set benchmark instead
    for m in ("tiny", "small", "base"):
        geo = _SR_BASE if m == "base" else _SR_SMALL
        for s in (2, 3, 4):
            out.append((f"sr_grl_{m}_c3x{s}", f"sr_grl_{m}_c3x{s}.ckpt",
                        [f"experiment=sr/grl_p256", f"model=grl/grl_{m}",
                         f"data_module.scale={s}",
                         "data_module.val.dataset="
                         "set5+set14+bsd100+urban100+manga109"] + geo))
    # JPEG: 3 models x {1,3} x {10,20,30,40} quality (grl_test.md:82-96)
    for m in ("tiny", "small", "base"):
        for c in (1, 3):
            metric = "restorer_jpeg_gray" if c == 1 else "restorer_jpeg"
            for q in (10, 20, 30, 40):
                out.append((f"jpeg_grl_{m}_c{c}q{q}",
                            f"jpeg_grl_{m}_c{c}q{q}.ckpt",
                            [f"experiment=jpeg/grl_p288", f"model=grl/grl_{m}",
                             f"data_module.quality_factor={q}",
                             f"data_module.num_channels={c}",
                             f"data_module.val.dataset={JPEG_VAL[c]}",
                             f"metric={metric}", "tile=288",
                             "tile_overlap=36"]))
    # demosaicking (grl_test.md:12-15)
    out.append(("dm_grl_small", "dm_grl_small.ckpt",
                ["experiment=dm/grl", "model=grl/grl_small"]))
    # blind SR, PSNR stage of the GAN model (grl_test.md:101-105)
    out.append(("bsr_grl_base", "bsr_grl_base.ckpt",
                ["experiment=bsr/grl", "model=grl/grl_base_bsr",
                 "engine.bsr_psnr_checkpoint=null",
                 "engine.bsr_discriminator_checkpoint=null"]))
    # defocus deblurring single/dual pixel (grl_test.md:108-120)
    out.append(("db_defocus_single_pixel_grl_base",
                "db_defocus_single_pixel_grl_base.ckpt",
                ["experiment=db_defocus/grl_p480", "model=grl/grl_base"]))
    out.append(("db_defocus_dual_pixel_grl_base",
                "db_defocus_dual_pixel_grl_base.ckpt",
                ["experiment=db_defocus/grl_p480", "model=grl/grl_base",
                 "data_module.dual_pixel=true"]))
    # motion deblurring (grl_test.md:123-142)
    for corpus, val in (("gopro", "gopro+hide"),
                        ("realblur_j", "realblur-j"),
                        ("realblur_r", "realblur-r")):
        out.append((f"db_motion_grl_base_{corpus}",
                    f"db_motion_grl_base_{corpus}.ckpt",
                    ["experiment=db_motion/grl_p480", "model=grl/grl_base",
                     "tile=0", "tile_overlap=0",
                     f"data_module.val.dataset={val}"]))
    return out


def run_recipe(name, ckpt, overrides, out_root, dtype):
    run_dir = osp.join(out_root, name)
    args = [sys.executable, "-m", "grlir.train", "training=false",
            f"pretrained_checkpoint={ckpt}",
            f"io.base_output_path={run_dir}", "io.version=parity",
            f"tag={name}", f"compute_dtype={dtype}",
            "attn_io=cm"] + overrides
    print(f"[{name}] {' '.join(args[3:])}")
    r = subprocess.run(args, cwd=ROOT, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-1500:])
        print(r.stderr[-1500:])
        return None
    return osp.join(run_dir, name, "version_parity", "results.csv")


def read_results(path):
    """results.csv -> {val_set: {metric: value}} from the last row per set."""
    out = {}
    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    for row in rows[1:]:
        if len(row) != len(header):
            continue
        rec = dict(zip(header, row))
        vals = {k: float(v) for k, v in rec.items()
                if k not in ("tag", "val_set", "step") and v}
        out[rec["val_set"]] = vals
    return out


def load_ref(path):
    ref = {}
    if not path:
        return ref
    with open(path) as f:
        for rec in csv.DictReader(f):
            ref[(rec["recipe"], rec["val_set"])] = {
                k: float(v) for k, v in rec.items()
                if k not in ("recipe", "val_set") and v}
    return ref


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--only", default="",
                   help="comma list of recipe-name prefixes (e.g. sr,dn)")
    p.add_argument("--ref", default="",
                   help="CSV of reference numbers: recipe,val_set,psnr[,ssim]")
    p.add_argument("--out", default=osp.join(ROOT, "PARITY_TABLE.md"))
    p.add_argument("--workdir", default=osp.join(ROOT, "parity_runs"))
    p.add_argument("--dtype", default="float32",
                   help="parity runs default fp32 + exact GELU (PARITY.md)")
    args = p.parse_args(argv)

    ckpt_dir = os.environ.get("GRLIR_CKPT_DIR")
    if not ckpt_dir or not osp.isdir(ckpt_dir):
        raise SystemExit(
            "GRLIR_CKPT_DIR not set or missing. Run tools/fetch_artifacts.py "
            "on a networked machine first (see its docstring).")
    if not os.environ.get("GRLIR_DATA_ROOT"):
        raise SystemExit("GRLIR_DATA_ROOT not set (see "
                         "tools/fetch_artifacts.py --list-data).")
    os.environ.setdefault("GRLIR_GELU_EXACT", "1")  # parity numerics

    prefixes = [s.strip() for s in args.only.split(",") if s.strip()]
    ref = load_ref(args.ref)
    lines = ["# Parity table (generated by tools/parity_table.py)", "",
             "Bar: within 0.01 dB PSNR of the reference checkpoint re-run "
             "(BASELINE.md).", "",
             "| recipe | val set | PSNR | SSIM | ref PSNR | Δ dB | verdict |",
             "|---|---|---|---|---|---|---|"]
    ran = skipped = failed = 0
    worst = 0.0
    for name, ckpt_file, overrides in recipes():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        ckpt = osp.join(ckpt_dir, ckpt_file)
        if not osp.exists(ckpt):
            skipped += 1
            continue
        csv_path = run_recipe(name, ckpt, overrides, args.workdir, args.dtype)
        if not csv_path or not osp.exists(csv_path):
            lines.append(f"| {name} | — | FAILED | | | | ✗ |")
            failed += 1
            continue
        ran += 1
        for val_set, vals in sorted(read_results(csv_path).items()):
            psnr = vals.get("psnr", vals.get("psnr_gray"))
            ssim = vals.get("ssim", vals.get("ssim_gray"))
            r = ref.get((name, val_set), {})
            rp = r.get("psnr")
            delta = (psnr - rp) if (psnr is not None and rp is not None) \
                else None
            verdict = ("PASS" if abs(delta) <= 0.01 else "FAIL") \
                if delta is not None else "—"
            if delta is not None:
                worst = max(worst, abs(delta))
            lines.append(
                f"| {name} | {val_set} "
                f"| {psnr:.4f} | {ssim:.4f} "
                f"| {rp if rp is not None else '—'} "
                f"| {f'{delta:+.4f}' if delta is not None else '—'} "
                f"| {verdict} |" if psnr is not None else
                f"| {name} | {val_set} | — | — | — | — | — |")
    lines += ["", f"Recipes run: {ran}, skipped (ckpt absent): {skipped}, "
                  f"failed: {failed}."
                  + (f"  Worst |Δ|: {worst:.4f} dB." if ref else
                     "  (no --ref CSV: deltas unavailable)"), ""]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

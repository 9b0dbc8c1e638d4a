"""HBM-traffic audit of a compiled GRL forward.

The round-1 performance method: dump the optimized HLO, estimate each
instruction's PADDED byte footprint under TPU tiling ((16, 128) for bf16,
(8, 128) for fp32 on the trailing two dims), and rank.  Arrays whose trailing
dims are much smaller than a tile are silently 4-32x more expensive than
their logical size — this audit found the 32x-padded head-split
intermediates and the 16x-padded pixel-shuffle 6D form that together cost
~45% of whole-model latency (see NEXT.md / README performance notes).

Usage:
  python tools/hlo_audit.py [--model small] [--hw 256] [--dtype bfloat16]
                            [--top 20] [--save /tmp/grl.hlo]

Modes:
  entry (default): sum over ENTRY-computation instructions only — the real
      inter-fusion HBM traffic (fusion-internal ops live in VMEM).
  all: every instruction incl. fusion-internal (spotting duplicated
      expensive elementwise like exact-GELU erfc).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT_BYTES = {"bf16": 2, "f32": 4, "s32": 4, "pred": 1, "u32": 4, "s8": 1}


def padded_bytes(dtype: str, dims, minor_to_major=None) -> int:
    """Array bytes under TPU tiling: the PHYSICAL minor dim pads to 128
    lanes, the second-minor to the sublane count (16 for bf16, 8 for fp32).

    ``minor_to_major`` is the HLO layout permutation (first entry = minor
    dim).  Without it the trailing-two logical dims are assumed physical
    minor — which overstates 6D window-partition intermediates by ~10x
    (XLA lays those out channel-minor: {3,5,2,4,1,0}), so pass the parsed
    layout whenever the HLO text carries one."""
    if not dims:
        return DT_BYTES.get(dtype, 4)
    d = list(dims)
    sub = 16 if dtype == "bf16" else 8
    if minor_to_major and len(minor_to_major) == len(d):
        mi = minor_to_major[0]
        d[mi] = -(-d[mi] // 128) * 128
        if len(d) >= 2:
            m2 = minor_to_major[1]
            d[m2] = -(-d[m2] // sub) * sub
    else:
        d[-1] = -(-d[-1] // 128) * 128
        if len(d) >= 2:
            d[-2] = -(-d[-2] // sub) * sub
    n = 1
    for v in d:
        n *= v
    return n * DT_BYTES.get(dtype, 4)


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+)[:}])?")
_OP_RE = re.compile(r"^\s+(?:ROOT )?%?([\w.-]+) = (\S+.*?)\s+([\w-]+)\(")


def audit_text(hlo_text: str, entry_only: bool = True, top: int = 20):
    """Returns (total_bytes, by_opkind, top_shapes) over the HLO text."""
    if entry_only:
        m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", hlo_text, re.S | re.M)
        hlo_text = m.group(1)
    by_kind, by_shape = {}, {}
    total = 0
    for line in hlo_text.splitlines():
        mm = _OP_RE.match(line)
        if not mm:
            continue
        _name, out_s, op = mm.groups()
        if op == "bitcast":
            continue  # layout reinterpret: no data movement
        if op == "get-tuple-element":
            continue  # tuple projection: metadata, no data movement
        if op in ("copy-start", "async-start"):
            # async pairs: the -start line carries a (dest, src, sync) tuple
            # (would double/triple-count); the -done line's output is the
            # one real array moved — count that side only
            continue
        if op == "custom-call":
            # count only the OUTPUT (consistent with every other op — reads
            # are the producers' writes); operand_layout_constraints would
            # double-count each operand
            line = line.split("operand_layout_constraints", 1)[0]
        b = sum(
            padded_bytes(
                dt,
                [int(x) for x in dims.split(",") if x] if dims else [],
                [int(x) for x in mtm.split(",")] if mtm else None)
            for dt, dims, mtm in _SHAPE_RE.findall(line) if dt in DT_BYTES
        )
        total += b
        k = by_kind.setdefault(op, [0, 0])
        k[0] += b
        k[1] += 1
        sh = _SHAPE_RE.findall(out_s)
        if sh:
            dt, dims, mtm = sh[0]
            dims = tuple(int(x) for x in dims.split(",") if x)
            s = by_shape.setdefault((op, dt, dims), [0, 0])
            s[0] += padded_bytes(
                dt, list(dims),
                [int(x) for x in mtm.split(",")] if mtm else None)
            s[1] += 1
    kinds = sorted(by_kind.items(), key=lambda kv: -kv[1][0])
    shapes = sorted(by_shape.items(), key=lambda kv: -kv[1][0])[:top]
    return total, kinds, shapes


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="small", choices=["tiny", "small", "base"])
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    # GRL-base w32/df2 eval-tile geometry overrides (bench_base_tile.py)
    ap.add_argument("--window", type=int, default=0,
                    help="override window_size (0 = model default)")
    ap.add_argument("--df", type=int, default=0,
                    help="override anchor_window_down_factor")
    ap.add_argument("--stripe", type=int, default=0,
                    help="override to fixed (s, s) stripes, no groups")
    ap.add_argument("--tail", default=None,
                    help="override upsampler ('' = identity dn tail)")
    ap.add_argument("--mode", default="entry", choices=["entry", "all"])
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--save", default=None, help="also write the HLO text here")
    ap.add_argument("--hlo", default=None,
                    help="audit an existing .hlo text file instead of compiling")
    args = ap.parse_args()

    if args.hlo:
        txt = open(args.hlo).read()
    else:
        from dataclasses import replace

        import jax

        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        import jax.numpy as jnp
        import numpy as np

        from grlir.models import zoo
        from grlir.models.grl import GRL

        cfg = replace(zoo.make_config(args.model), dtype=args.dtype)
        if args.window:
            cfg = replace(cfg, window_size=args.window)
        if args.df:
            cfg = replace(cfg, anchor_window_down_factor=args.df)
        if args.stripe:
            cfg = replace(cfg, stripe_size=(args.stripe, args.stripe),
                          stripe_groups=(None, None))
        if args.tail is not None:
            cfg = replace(cfg, upscale=1 if args.tail == "" else cfg.upscale,
                          upsampler=args.tail)
        model = GRL(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).random((args.bs, args.hw, args.hw, 3)),
            jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        txt = jax.jit(model.apply).lower(params, x).compile().as_text()
        if args.save:
            open(args.save, "w").write(txt)

    total, kinds, shapes = audit_text(txt, args.mode == "entry", args.top)
    scope = "entry-computation" if args.mode == "entry" else "all instructions"
    print(f"padded traffic ({scope}): {total/1e9:.1f} GB")
    for op, (b, n) in kinds[:10]:
        print(f"  {b/1e9:7.2f} GB  x{n:5d}  {op}")
    print(f"--- top {args.top} by output shape ---")
    for (op, dt, dims), (b, n) in shapes:
        print(f"  {b/1e9:6.2f} GB  x{n:4d}  {op:9s} {dt}{list(dims)}")


if __name__ == "__main__":
    main()

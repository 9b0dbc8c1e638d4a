"""Staged TPU bench for the Pallas v3 block-half kernels (round-4 item 1).

The v3 kernels (grlir/ops/pallas/block_attn.py) were interpret-mode-parity
tested in round 3 but never executed on hardware; Mosaic enforces constraints
interpret mode hides (docs/PALLAS_V3_DESIGN.md "Measured kernel facts" #3).
This bench is stage-gated per the design doc:

  stage compile : pallas_call(interpret=False) each kernel at GRL-S
                  geometries — catches Mosaic lowering rejections.
  stage parity  : DEVICE-NUMERICS CERTIFICATION (round-5 item 1): each
                  Mosaic-compiled kernel vs its pure-XLA twin on identical
                  boundary operands, every supported geometry incl. the
                  GRL-base w32 large-window path, max|Δ| asserted.
  stage micro   : kernel vs its XLA-equivalent block-half, scan-amortized.
  stage model   : whole GRL-S forward, v3 vs XLA cm, via the bench.py
                  methodology (scan minus single-call to kill the ~35 ms
                  tunnel round-trip floor).
  stage e2e     : user-surface check (round-5 item 6): whole-model forward
                  AND tiled Restorer output, v3 vs pallas-off, same params —
                  asserts the serving default path end to end.

Usage: python tools/bench_v3.py [compile|parity|micro|model|e2e|all]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "GRLIR_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


# GRL-S geometries (zoo.GRL_SMALL @ 256 and 384 inputs):
#   embed 128, half C=64, heads 2, window 8x8
#   H-stripes (8, W) are stripe_size rows... see ops/geometry: stripes
#   alternate (8, None)-sized windows and groups=4 full-axis stripes.
def _window_case(hw: int, shifted: bool):
    """Build inputs for fused_window_half at GRL-S geometry."""
    import jax.numpy as jnp

    from grlir.ops import geometry

    rng = np.random.default_rng(0)
    B, H, W, C = 1, hw, hw, 128
    h, Cw, win = 2, 64, (8, 8)
    N = win[0] * win[1]
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * Cw)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * Cw,)) * 0.01, jnp.float32)
    logit_scale = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    bands = None
    if shifted:
        bands = jnp.asarray(
            geometry.fill_window((H, W), win).astype(np.int32))
    return dict(x=x, wqkv=wqkv, bqkv=bqkv, logit_scale=logit_scale,
                bias=bias, window=win, bands=bands)


def _stripe_case(hw: int, horizontal: bool, shifted: bool):
    """fused_stripe_half inputs at GRL-S geometry.

    GRL-S stripes: stripe_size=(8, None), stripe_groups=(None, 4) =>
    horizontal blocks use stripe (8, W? no — (8, hw//4)?).  Per
    models/blocks.py the per-block stripe is (8, W_group) with the grouped
    axis spanning hw//4.  We bench both orientations at the shapes the
    model actually uses: (8, hw//4) and (hw//4, 8).
    """
    import jax.numpy as jnp

    from grlir.ops import geometry

    rng = np.random.default_rng(1)
    B, H, W, C = 1, hw, hw, 128
    h, Cs, df = 2, 64, 4
    stripe = (8, hw // 4) if horizontal else (hw // 4, 8)
    sh, sw = stripe
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    anchor = jnp.asarray(
        rng.standard_normal((B, H // df, W // df, Cs)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * Cs)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * Cs,)) * 0.01, jnp.float32)
    s1 = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    bias_a2w = jnp.asarray(rng.standard_normal((h, N2, N1)), jnp.float32)
    bias_w2a = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)
    bands = bands_a = None
    if shifted:
        bands = jnp.asarray(
            geometry.fill_window((H, W), stripe).astype(np.int32))
        bands_a = jnp.asarray(
            geometry.fill_window((H // df, W // df), (ah, aw)).astype(
                np.int32))
    return dict(x=x, anchor=anchor, wqkv=wqkv, bqkv=bqkv,
                logit_scale1=s1, logit_scale2=s2, bias_a2w=bias_a2w,
                bias_w2a=bias_w2a, stripe=stripe, df=df,
                bands=bands, bands_a=bands_a)


def _timed(jax, fn, *args, iters=20, tag=""):
    """Scan-amortized timing: (scan(iters) - single) / (iters-1).

    The first argument is scanned over a varying leading axis (fresh data per
    iteration) so XLA cannot hoist the loop-invariant call out of the scan.
    """
    import jax.numpy as jnp

    x0, rest = args[0], args[1:]
    key = jax.random.PRNGKey(0)
    xs = x0[None] * (1.0 + 0.01 * jax.random.normal(
        key, (iters,) + (1,) * x0.ndim, jnp.float32)).astype(x0.dtype)

    def many(xs_, a):
        def body(c, x):
            return c + jnp.sum(fn(x, *a).astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs_)
        return c

    fn_n = jax.jit(many)
    fn_1 = jax.jit(lambda x, a: jnp.sum(fn(x, *a).astype(jnp.float32)))
    float(fn_n(xs, rest))
    float(fn_1(x0, rest))
    tn, t1 = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(fn_n(xs, rest)); tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fn_1(x0, rest)); t1.append(time.perf_counter() - t0)
    per = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1)
    print(f"  {tag}: {per*1e3:.3f} ms/call")
    return per


def stage_compile():
    jax = _setup_jax()
    from grlir.ops.pallas.block_attn import (fused_stripe_half,
                                             fused_window_half)

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok = True
    for hw in (256, 384):
        for shifted in (False, True):
            tag = f"window hw={hw} shifted={shifted}"
            try:
                c = _window_case(hw, shifted)
                win, bands = c.pop("window"), c.pop("bands")
                t0 = time.perf_counter()
                y = jax.jit(lambda **kw: fused_window_half(
                    window=win, bands=bands, interpret=False, **kw))(**c)
                s = float(np.sum(np.asarray(y, np.float32)))
                print(f"COMPILE OK  {tag}  ({time.perf_counter()-t0:.1f}s, "
                      f"sum={s:.3f})")
            except Exception:
                ok = False
                print(f"COMPILE FAIL {tag}")
                traceback.print_exc(limit=8)
        for horizontal in (True, False):
            for shifted in (False, True):
                tag = (f"stripe hw={hw} horiz={horizontal} "
                       f"shifted={shifted}")
                try:
                    c = _stripe_case(hw, horizontal, shifted)
                    st, df = c.pop("stripe"), c.pop("df")
                    t0 = time.perf_counter()
                    y = jax.jit(lambda **kw: fused_stripe_half(
                        stripe=st, df=df, interpret=False, **kw))(**c)
                    s = float(np.sum(np.asarray(y, np.float32)))
                    print(f"COMPILE OK  {tag}  "
                          f"({time.perf_counter()-t0:.1f}s, sum={s:.3f})")
                except Exception:
                    ok = False
                    print(f"COMPILE FAIL {tag}")
                    traceback.print_exc(limit=8)
    print("stage compile:", "ALL OK" if ok else "FAILURES (see above)")
    return ok


def _large_stripe_case(hw: int, shifted: bool):
    """GRL-base w32/df2 eval-tile stripe geometry: stripe (64,64), N1=4096,
    N2=1024 — the streamed-bias two-kernel path (embed 180, half C=90)."""
    import jax.numpy as jnp

    from grlir.ops import geometry

    rng = np.random.default_rng(3)
    B, H, W, C = 1, hw, hw, 180
    h, Cs, df = 3, 90, 2
    stripe = (64, 64)
    sh, sw = stripe
    ah, aw = sh // df, sw // df
    N1, N2 = sh * sw, ah * aw
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    anchor = jnp.asarray(
        rng.standard_normal((B, H // df, W // df, Cs)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * Cs)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * Cs,)) * 0.01, jnp.float32)
    s1 = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    bias_a2w = jnp.asarray(rng.standard_normal((h, N2, N1)), jnp.float32)
    bias_w2a = jnp.asarray(rng.standard_normal((h, N1, N2)), jnp.float32)
    bands = bands_a = None
    if shifted:
        bands = jnp.asarray(
            geometry.fill_window((H, W), stripe).astype(np.int32))
        bands_a = jnp.asarray(
            geometry.fill_window((H // df, W // df), (ah, aw)).astype(
                np.int32))
    return dict(x=x, anchor=anchor, wqkv=wqkv, bqkv=bqkv,
                logit_scale1=s1, logit_scale2=s2, bias_a2w=bias_a2w,
                bias_w2a=bias_w2a, stripe=stripe, df=df,
                bands=bands, bands_a=bands_a)


def _large_window_case(hw: int, shifted: bool):
    """GRL-base w32 eval-tile window geometry: window (32,32), N=1024 — the
    q-row-tiled large-window kernel path (embed 180, half C=90, heads 3)."""
    import jax.numpy as jnp

    from grlir.ops import geometry

    rng = np.random.default_rng(2)
    B, H, W, C = 1, hw, hw, 180
    h, Cw, win = 3, 90, (32, 32)
    N = win[0] * win[1]
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * Cw)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * Cw,)) * 0.01, jnp.float32)
    logit_scale = jnp.asarray(rng.standard_normal((h, 1)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    bands = None
    if shifted:
        bands = jnp.asarray(
            geometry.fill_window((H, W), win).astype(np.int32))
    return dict(x=x, wqkv=wqkv, bqkv=bqkv, logit_scale=logit_scale,
                bias=bias, window=win, bands=bands)


def _compare(jax, name, run_kernel, run_ref, operands, tol):
    """Run compiled kernel + XLA twin on traced operands (traced, not
    closed-over, so XLA cannot constant-fold either side on host), print
    and assert max|Δ|."""
    yk = np.asarray(jax.jit(run_kernel)(**operands), np.float32)
    yr = np.asarray(jax.jit(run_ref)(**operands), np.float32)
    d = np.abs(yk - yr)
    mx, mean = float(d.max()), float(d.mean())
    scale = float(np.abs(yr).std()) or 1.0
    ok = mx <= tol
    print(f"  {'OK ' if ok else 'FAIL'} {name}: max|Δ|={mx:.3e} "
          f"mean|Δ|={mean:.3e} (out std={scale:.3f}, tol={tol:.1e})")
    return ok, mx


def stage_parity():
    """Certify Mosaic-COMPILED kernel numerics vs the pure-XLA twin on the
    same boundary operands, on the real device.  Every interpret-mode parity
    test in tests/test_block_attn.py has a compiled twin here.

    Tolerance: outputs are bf16 (serving dtype).  Both paths use bf16 MXU
    matmuls with fp32 accumulation and fp32 softmax, but accumulation ORDER
    differs (Mosaic tiling vs XLA fusion), so results may differ by a few
    bf16 ulps at output magnitude ~1 — tol 3.2e-2 ≈ 4 ulps at 1.0 for the
    elementwise max; the mean must sit far below (reported).
    """
    jax = _setup_jax()
    from grlir.ops.pallas.block_attn import (fused_stripe_half,
                                             fused_window_half)

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        print("stage parity: SKIP (needs TPU hardware; interpret-mode "
              "parity is covered by tests/test_block_attn.py)")
        return True
    TOL = 3.2e-2
    ok = True
    rows = []
    def win_pair(win, bands, shift=0):
        return (
            lambda **c: fused_window_half(
                window=win, bands=bands, shift=shift, interpret=False, **c),
            lambda **c: fused_window_half(
                window=win, bands=bands, shift=shift, ref=True, **c))

    for hw in (256, 384):
        for shifted in (False, True):
            c = _window_case(hw, shifted)
            kf, rf = win_pair(c.pop("window"), c.pop("bands"))
            o, mx = _compare(jax, f"window hw={hw} shifted={shifted}",
                             kf, rf, c, TOL)
            ok &= o
            rows.append((f"window {hw} shifted={shifted}", mx))
        # round-5 in-kernel shift (stitched half-row reads + bitcast
        # column rotate): both sides see the SAME unrolled x; ref rolls
        # internally — certifies the rotate path the model default now uses
        c = _window_case(hw, True)
        win = c.pop("window")
        kf, rf = win_pair(win, c.pop("bands"), shift=win[0] // 2)
        o, mx = _compare(jax, f"window hw={hw} in-kernel shift",
                         kf, rf, c, TOL)
        ok &= o
        rows.append((f"window {hw} ik-shift", mx))
        c = _stripe_case(hw, True, True)
        st, df = c.pop("stripe"), c.pop("df")
        s = (st[0] // 2, st[1] // 2)
        o, mx = _compare(
            jax, f"stripe hw={hw} in-kernel shift",
            lambda st=st, df=df, s=s, **c: fused_stripe_half(
                stripe=st, df=df, shift=s, interpret=False, **c),
            lambda st=st, df=df, s=s, **c: fused_stripe_half(
                stripe=st, df=df, shift=s, ref=True, **c), c, TOL)
        ok &= o
        rows.append((f"stripe {hw} ik-shift", mx))
        for horizontal in (True, False):
            for shifted in (False, True):
                c = _stripe_case(hw, horizontal, shifted)
                st, df = c.pop("stripe"), c.pop("df")
                o, mx = _compare(
                    jax, f"stripe hw={hw} horiz={horizontal} "
                         f"shifted={shifted}",
                    lambda st=st, df=df, **c: fused_stripe_half(
                        stripe=st, df=df, interpret=False, **c),
                    lambda st=st, df=df, **c: fused_stripe_half(
                        stripe=st, df=df, ref=True, **c), c, TOL)
                ok &= o
                rows.append((f"stripe {hw} horiz={horizontal} "
                             f"shifted={shifted}", mx))
    for shifted in (False, True):
        c = _large_window_case(256, shifted)
        kf, rf = win_pair(c.pop("window"), c.pop("bands"))
        o, mx = _compare(jax, f"large-window w32 hw=256 shifted={shifted}",
                         kf, rf, c, TOL)
        ok &= o
        rows.append((f"large-window w32 shifted={shifted}", mx))
    for shifted in (False, True):
        c = _large_stripe_case(256, shifted)
        st, df = c.pop("stripe"), c.pop("df")
        o, mx = _compare(
            jax, f"large-stripe 64x64/df2 hw=256 shifted={shifted}",
            lambda st=st, df=df, **c: fused_stripe_half(
                stripe=st, df=df, interpret=False, **c),
            lambda st=st, df=df, **c: fused_stripe_half(
                stripe=st, df=df, ref=True, **c), c, TOL)
        ok &= o
        rows.append((f"large-stripe shifted={shifted}", mx))
    print("stage parity:", "ALL OK" if ok else "FAILURES (see above)")
    return ok


def stage_e2e():
    """User-surface certification: whole GRL-S model + tiled Restorer,
    use_pallas_attention='v3' vs False on identical params/input, on TPU.
    Catches what kernel-level parity can't: geometry cache, VMEM-guard
    fallback routing, packed-bias construction inside the model, tiling."""
    jax = _setup_jax()
    if jax.default_backend() != "tpu":
        print("stage e2e: SKIP (needs TPU hardware)")
        return True
    from dataclasses import replace

    import jax.numpy as jnp

    from grlir.engines.inference import Restorer
    from grlir.models import zoo
    from grlir.models.grl import GRL

    ok = True
    rng = np.random.default_rng(7)
    img = rng.random((1, 256, 256, 3), np.float32)
    cfg0 = replace(zoo.GRL_SMALL, dtype="bfloat16")
    outs = {}
    params = None
    for mode in (False, "v3"):
        cfg = replace(cfg0, use_pallas_attention=mode)
        model = GRL(cfg)
        if params is None:
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3), jnp.float32))
        outs[mode] = np.asarray(
            jax.jit(lambda p, x, m=model: m.apply(p, x))(
                params, jnp.asarray(img)), np.float32)
    d = np.abs(outs["v3"] - outs[False])
    mse = float((d ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse else float("inf")
    print(f"  whole-model GRL-S 256²: max|Δ|={d.max():.3e} "
          f"mean|Δ|={d.mean():.3e} PSNR(v3 vs off)={psnr:.1f} dB")
    ok &= psnr >= 60.0

    # serve surface: tiled Restorer (tile 128, overlap 16) both modes
    big = rng.random((1, 320, 320, 3), np.float32)
    touts = {}
    for mode in (False, "v3"):
        cfg = replace(cfg0, use_pallas_attention=mode)
        model = GRL(cfg)
        r = Restorer(lambda p, x, m=model: m.apply(p, x), params,
                     scale=4, tile=128, tile_overlap=16)
        touts[mode] = r(big)
    d = np.abs(touts["v3"].astype(np.float32) -
               touts[False].astype(np.float32))
    mse = float((d ** 2).mean())
    psnr = 10 * np.log10(1.0 / mse) if mse else float("inf")
    print(f"  tiled Restorer 320²/t128: max|Δ|={d.max():.3e} "
          f"PSNR(v3 vs off)={psnr:.1f} dB")
    ok &= psnr >= 60.0
    print("stage e2e:", "ALL OK" if ok else "FAILURES (see above)")
    return ok


def stage_micro():
    jax = _setup_jax()
    from grlir.ops.pallas.block_attn import (fused_stripe_half,
                                             fused_window_half)

    for hw in (256, 384):
        for shifted in (False, True):
            c = _window_case(hw, shifted)
            args = tuple(c[k] for k in
                         ("x", "wqkv", "bqkv", "logit_scale", "bias"))
            bands = c["bands"]
            win = c["window"]
            _timed(jax, lambda *a: fused_window_half(
                *a, window=win, bands=bands, interpret=False), *args,
                tag=f"v3 window hw={hw} shifted={shifted}")
            # XLA-equivalent block-half on the SAME boundary operands (the
            # ref twin): the honest per-kernel comparison column
            _timed(jax, lambda *a: fused_window_half(
                *a, window=win, bands=bands, ref=True), *args,
                tag=f"xla window hw={hw} shifted={shifted}")
        for horizontal in (True, False):
            c = _stripe_case(hw, horizontal, False)
            args = tuple(c[k] for k in
                         ("x", "anchor", "wqkv", "bqkv", "logit_scale1",
                          "logit_scale2", "bias_a2w", "bias_w2a"))
            st, df = c["stripe"], c["df"]
            _timed(jax, lambda *a: fused_stripe_half(
                *a, stripe=st, df=df, interpret=False), *args,
                tag=f"v3 stripe hw={hw} horiz={horizontal}")
            _timed(jax, lambda *a: fused_stripe_half(
                *a, stripe=st, df=df, ref=True), *args,
                tag=f"xla stripe hw={hw} horiz={horizontal}")
    # large-geometry paths (GRL-base w32/df2 eval tiles)
    for shifted in (False, True):
        c = _large_window_case(256, shifted)
        args = tuple(c[k] for k in
                     ("x", "wqkv", "bqkv", "logit_scale", "bias"))
        bands, win = c["bands"], c["window"]
        _timed(jax, lambda *a: fused_window_half(
            *a, window=win, bands=bands, interpret=False), *args,
            tag=f"v3 large-window w32 shifted={shifted}")
        _timed(jax, lambda *a: fused_window_half(
            *a, window=win, bands=bands, ref=True), *args,
            tag=f"xla large-window w32 shifted={shifted}")
        c = _large_stripe_case(256, shifted)
        args = tuple(c[k] for k in
                     ("x", "anchor", "wqkv", "bqkv", "logit_scale1",
                      "logit_scale2", "bias_a2w", "bias_w2a"))
        st, df = c["stripe"], c["df"]
        bands_s, bands_a = c["bands"], c["bands_a"]
        _timed(jax, lambda *a: fused_stripe_half(
            *a, stripe=st, df=df, bands=bands_s, bands_a=bands_a,
            interpret=False), *args,
            tag=f"v3 large-stripe 64x64/df2 shifted={shifted}")
        _timed(jax, lambda *a: fused_stripe_half(
            *a, stripe=st, df=df, bands=bands_s, bands_a=bands_a,
            ref=True), *args,
            tag=f"xla large-stripe 64x64/df2 shifted={shifted}")


def stage_model():
    os.environ.setdefault("GRLIR_BENCH_SKIP_TORCH", "1")
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for hw in ("256", "384"):
        for mode in ("0", "v3"):
            env = dict(os.environ, GRLIR_BENCH_PALLAS=mode,
                       GRLIR_BENCH_HW=hw, GRLIR_BENCH_SKIP_TORCH="1")
            r = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600)
            line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
            print(f"model hw={hw} pallas={mode}: {line}")
            if r.returncode:
                print(r.stderr[-2000:])


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rc = 0
    if which in ("compile", "all"):
        if not stage_compile() and which == "all":
            sys.exit("stage compile failed; fix before micro/model")
    if which in ("parity", "all"):
        rc |= 0 if stage_parity() else 1
    if which in ("micro", "all"):
        stage_micro()
    if which in ("model", "all"):
        stage_model()
    if which in ("e2e", "all"):
        rc |= 0 if stage_e2e() else 1
    sys.exit(rc)

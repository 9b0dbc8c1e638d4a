"""Experiment: channel-major ×4-SR tail (conv_last NCHW-out) A/B timing.

The post-v3 HLO audit (round 5) shows the pixelshuffle tail is the largest
remaining entry-traffic family at GRL-S 256²: conv_last's C=3-minor output
pads 43x under (8,128) lane tiling (bf16[1024,8,129,3] ~0.5 GB padded for a
6 MB logical tensor) and its 1024² input is copied into an 8-chunk halo form
(~0.5 GB).  This measures the whole-model effect of emitting conv_last
channel-major ((1,3,4H,4W): trailing dims (4H,4W), zero padding) with the
mean-shift epilogue applied channel-first and a final logical transpose that
fuses into the consumer.

Methodology = bench.py (scan minus single call, K-1 amortized).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, params, xs, iters):
    import jax
    import jax.numpy as jnp

    def many(p, v):
        def body(c, x):
            return c + jnp.sum(fn(p, x).astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, 0.0, v)
        return c

    fwd_n = jax.jit(many)
    fwd_1 = jax.jit(lambda p, v: jnp.sum(fn(p, v).astype(jnp.float32)))
    float(fwd_n(params, xs))
    float(fwd_1(params, xs[0]))
    tn, t1 = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        float(fwd_n(params, xs))
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fwd_1(params, xs[0]))
        t1.append(time.perf_counter() - t0)
    return (float(np.median(tn)) - float(np.median(t1))) / (len(xs) - 1)


def main():
    from dataclasses import replace

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from grlir.models import zoo
    from grlir.models.grl import GRL

    hw = int(os.environ.get("GRLIR_EXP_HW", "256"))
    iters = int(os.environ.get("GRLIR_EXP_ITERS", "20"))
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((iters, 1, hw, hw, 3)), jnp.float32)

    results = {}
    outs = {}
    for mode in ("nhwc", "cmajor"):
        cfg = replace(zoo.GRL_SMALL, dtype="bfloat16", tail_layout=mode)
        model = GRL(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xs[0])
        per = bench(model.apply, params, xs, iters)
        results[mode] = per
        outs[mode] = np.asarray(
            jax.jit(model.apply)(params, xs[0]), np.float32)
        print(f"{mode}: {per*1e3:.2f} ms/frame "
              f"({hw*hw/1e6/per:.3f} MP/s)")
    d = np.abs(outs["nhwc"] - outs["cmajor"]).max()
    print(f"max|Δ| nhwc vs cmajor: {d:.3e}")
    print(f"speedup: {results['nhwc']/results['cmajor']:.3f}x")


if __name__ == "__main__":
    main()

"""GRL-base tiled-eval per-tile bench (the big-model serving shape).

The reference evaluates GRL-base denoising with window 32 / anchor df 2 and
256-px tiles (scripts/grl/grl_test.md:46); at that geometry each window holds
1024 tokens and the attention matrices dominate HBM traffic.  Round-1 measured
~445 ms/tile of pure compute.  Prints one JSON line per variant.

Env: GRLIR_TILE_HW (256), GRLIR_TILE_ITERS (8), GRLIR_TILE_DTYPE (bfloat16),
GRLIR_TILE_IO (unset = config default), GRLIR_TILE_PALLAS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dataclasses import replace

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GRLIR_JAX_CACHE",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from grlir.models import zoo
    from grlir.models.grl import GRL

    hw = int(os.environ.get("GRLIR_TILE_HW", "256"))
    iters = int(os.environ.get("GRLIR_TILE_ITERS", "8"))
    # GRL-base denoising eval geometry (grl_test.md:46): window 32, df 2,
    # fixed 64/64 stripes, identity tail
    cfg = replace(
        zoo.GRL_BASE,
        upscale=1, upsampler="",
        window_size=32, anchor_window_down_factor=2,
        stripe_size=(64, 64), stripe_groups=(None, None),
        dtype=os.environ.get("GRLIR_TILE_DTYPE", "bfloat16"),
    )
    if os.environ.get("GRLIR_TILE_IO"):
        cfg = replace(cfg, attn_io=os.environ["GRLIR_TILE_IO"])
    # "" keeps the model default ("auto" -> v3 on TPU); "off" forces XLA
    pl = os.environ.get("GRLIR_TILE_PALLAS", "")
    if pl:
        cfg = replace(
            cfg,
            use_pallas_attention=(
                pl if pl in ("window", "stripe", "v3") else
                False if pl in ("off", "0") else True))
    if os.environ.get("GRLIR_TILE_BIAS") == "pairflat":
        from grlir.models.blocks import set_bias_pair_flat

        set_bias_pair_flat(True)

    model = GRL(cfg)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((iters, 1, hw, hw, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xs[0])

    def many(p, v):
        def body(c, x):
            return c + jnp.sum(model.apply(p, x).astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, 0.0, v)
        return c

    fwd_n = jax.jit(many)
    fwd_1 = jax.jit(lambda p, v: jnp.sum(model.apply(p, v).astype(jnp.float32)))
    float(fwd_n(params, xs))
    float(fwd_1(params, xs[0]))
    tn, t1 = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(fwd_n(params, xs))
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fwd_1(params, xs[0]))
        t1.append(time.perf_counter() - t0)
    assert np.isfinite(s)
    per_tile = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1)
    print(json.dumps({
        "metric": f"grl_base_w32df2_tile{hw}_ms",
        "value": round(per_tile * 1e3, 1),
        "unit": "ms/tile",
        "attn_io": cfg.attn_io,
        "pallas": str(cfg.use_pallas_attention),
        "r1_baseline_ms": 445,
    }))


if __name__ == "__main__":
    main()

"""Train-step throughput bench (GRL-S x4 SR recipe shapes).

Measures the full jitted train step (forward + loss + grad + adam update) at
the reference sr training shape — batch 8 of 64px LR patches -> 256px GT,
bf16 compute (config/experiment/sr/grl/grl_p256.yaml geometry is settable via
env).  Prints one JSON line.

Methodology matches bench.py: K steps inside one lax.scan program minus a
single-step program, divided by K-1, to amortize the ~30-40 ms axon dispatch
floor.

Env: GRLIR_TRAIN_BS (8), GRLIR_TRAIN_LQ (64), GRLIR_TRAIN_ITERS (8),
GRLIR_TRAIN_DTYPE (bfloat16), GRLIR_TRAIN_MODEL (small).
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
    import optax

    from grlir.engines.train import create_state, make_train_step
    from grlir.models import zoo
    from grlir.models.grl import GRL

    bs = int(os.environ.get("GRLIR_TRAIN_BS", "8"))
    lq_hw = int(os.environ.get("GRLIR_TRAIN_LQ", "64"))
    iters = int(os.environ.get("GRLIR_TRAIN_ITERS", "8"))
    name = os.environ.get("GRLIR_TRAIN_MODEL", "small")
    cfg = replace(
        {"tiny": zoo.GRL_TINY, "small": zoo.GRL_SMALL,
         "base": zoo.GRL_BASE}[name],
        dtype=os.environ.get("GRLIR_TRAIN_DTYPE", "bfloat16"),
    )
    # default to the TRAINING io (grlir.train pins legacy: its backward is
    # ~7% faster than cm; serving uses cm)
    cfg = replace(cfg, attn_io=os.environ.get("GRLIR_TRAIN_IO", "legacy"))
    if os.environ.get("GRLIR_TRAIN_QKV_MODE"):
        from grlir.models.blocks import set_qkv_cm_mode

        set_qkv_cm_mode(os.environ["GRLIR_TRAIN_QKV_MODE"])
    if os.environ.get("GRLIR_TRAIN_BIAS") == "pairflat":
        from grlir.models.blocks import set_bias_pair_flat

        set_bias_pair_flat(True)
    model = GRL(cfg)
    opt = optax.adam(2e-4)
    raw_step = make_train_step(model, opt, {"l1": 1.0}, jit_compile=False)

    rng = np.random.default_rng(0)
    up = cfg.upscale
    batch = {
        "img_lq": jnp.asarray(
            rng.random((bs, lq_hw, lq_hw, 3)), jnp.float32),
        "img_gt": jnp.asarray(
            rng.random((bs, lq_hw * up, lq_hw * up, 3)), jnp.float32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["img_lq"][:1])
    state = create_state(params, opt)
    key = jax.random.PRNGKey(1)

    def many(state, batch, key):
        def body(carry, k):
            st, _ = raw_step(carry, batch, k)
            return st, st.step
        st, _ = jax.lax.scan(body, state, jax.random.split(key, iters))
        return st.step, st.params["params"]["conv_first"]["bias"][0]

    def one(state, batch, key):
        st, m = raw_step(state, batch, key)
        return st.step, m["loss"]

    fwd_n = jax.jit(many)
    fwd_1 = jax.jit(one)
    float(fwd_n(state, batch, key)[1])
    float(fwd_1(state, batch, key)[1])

    tn, t1 = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        s = float(fwd_n(state, batch, key)[1])
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fwd_1(state, batch, key)[1])
        t1.append(time.perf_counter() - t0)
    assert np.isfinite(s)
    per_step = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1)
    print(json.dumps({
        "metric": f"grl_{name}_train_step_bs{bs}_lq{lq_hw}",
        "value": round(bs / per_step, 2),
        "unit": "samples/sec/chip",
        "step_ms": round(per_step * 1e3, 2),
    }))


if __name__ == "__main__":
    main()

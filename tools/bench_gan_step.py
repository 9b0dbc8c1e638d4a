"""GAN train-step protocol-cost bench (BSR stage-2 recipe shape).

Measures the full jitted two-optimizer GAN step at the reference BSR recipe
geometry — GRL-base-bsr generator (window 16, stripes 32/64 fixed, anchor
df 4, nearest+conv tail, remat) on LR patch 128 -> GT 512, batch 1, plus the
UNet-SN discriminator (num_feat 64) — for BOTH step protocols:

  lightning : the reference's Lightning optimizer_idx protocol (fresh G
              forward for the D step, 3 SN power iterations per step;
              reference engines/base_gan.py:86-90) — the config default.
  single    : BasicSR-style single-forward step (one G forward, 2 SN
              iterations) — the cheaper deliberate deviation, selectable
              via engine.lightning_parity=false.

Methodology matches bench.py / bench_train.py: K steps inside one lax.scan
program minus a single-step program, divided by K-1, amortizing the
~30-40 ms axon dispatch floor.  Prints one JSON line per protocol.

Env: GRLIR_GAN_BS (1), GRLIR_GAN_LQ (128), GRLIR_GAN_ITERS (4),
GRLIR_GAN_DTYPE (bfloat16), GRLIR_GAN_PROTO (both|lightning|single).
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

    from grlir.engines.gan import (GANLossConfig, create_gan_state,
                                   make_gan_train_step)
    from grlir.models import zoo
    from grlir.models.discriminator import UNetDiscriminatorSN
    from grlir.models.grl import GRL

    bs = int(os.environ.get("GRLIR_GAN_BS", "1"))
    lq_hw = int(os.environ.get("GRLIR_GAN_LQ", "128"))
    iters = int(os.environ.get("GRLIR_GAN_ITERS", "4"))
    proto = os.environ.get("GRLIR_GAN_PROTO", "both")

    # BSR stage-2 generator geometry (configs/experiment/bsr/grl.yaml:52-59,
    # reference config/experiment/bsr/grl.yaml:60-73)
    cfg = replace(
        zoo.GRL_BASE_BSR,
        upscale=4,
        window_size=16,
        stripe_size=(32, 64),
        stripe_groups=(None, None),
        anchor_window_down_factor=4,
        remat=True,
        dtype=os.environ.get("GRLIR_GAN_DTYPE", "bfloat16"),
    )
    gen = GRL(cfg)
    disc = UNetDiscriminatorSN(num_feat=64, skip_connection=True)

    rng = np.random.default_rng(0)
    up = cfg.upscale
    batch = {
        "img_lq": jnp.asarray(rng.random((bs, lq_hw, lq_hw, 3)), jnp.float32),
        "img_gt": jnp.asarray(
            rng.random((bs, lq_hw * up, lq_hw * up, 3)), jnp.float32),
    }
    params_g = jax.jit(gen.init)(jax.random.PRNGKey(0), batch["img_lq"][:1])
    disc_vars = jax.jit(disc.init)(jax.random.PRNGKey(1), batch["img_gt"][:1])
    opt_g = optax.adam(1e-5)
    opt_d = optax.adam(1e-5)

    modes = {"lightning": True, "single": False}
    if proto != "both":
        modes = {proto: modes[proto]}
    results = {}
    for name, lp in modes.items():
        raw = make_gan_train_step(gen, disc, opt_g, opt_d,
                                  GANLossConfig(), lightning_parity=lp)
        state0 = create_gan_state(params_g, disc_vars, opt_g, opt_d)

        def many(state, batch, key, raw=raw):
            def body(carry, k):
                st, _ = raw(carry, batch, k)
                return st, st.step
            st, _ = jax.lax.scan(body, state,
                                 jax.random.split(key, iters))
            return st.step, jnp.mean(st.params_d["params"]
                                     ["conv0"]["kernel"])

        def one(state, batch, key, raw=raw):
            st, m = raw(state, batch, key)
            return st.step, m["loss_g"]

        fwd_n = jax.jit(many)
        fwd_1 = jax.jit(one)
        key = jax.random.PRNGKey(2)
        float(fwd_n(state0, batch, key)[1])
        float(fwd_1(state0, batch, key)[1])
        tn, t1 = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            s = float(fwd_n(state0, batch, key)[1])
            tn.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fwd_1(state0, batch, key)[1])
            t1.append(time.perf_counter() - t0)
        assert np.isfinite(s)
        per_step = (float(np.median(tn)) - float(np.median(t1))) / (iters - 1)
        results[name] = per_step
        print(json.dumps({
            "metric": f"bsr_gan_step_{name}_bs{bs}_lq{lq_hw}",
            "value": round(per_step * 1e3, 2),
            "unit": "ms/step",
        }))
    if len(results) == 2:
        print(json.dumps({
            "metric": "bsr_gan_lightning_over_single",
            "value": round(results["lightning"] / results["single"], 3),
            "unit": "x",
        }))


if __name__ == "__main__":
    main()

"""'auto' pallas-mode resolution: v3 for TPU inference traces ONLY.

Round-4 verdict: auto->v3 silently engaged in training, where the v3 custom
VJP recomputes the whole XLA forward inside the backward
(ops/pallas/block_attn.py:_window_half_fn) — measured 46.6 vs 29.9 ms/step.
These tests pin the fix: training traces (deterministic=False) resolve to
the XLA path, inference traces keep the kernels, explicit modes are honored.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_resolve_auto_matrix(monkeypatch):
    from grlir.models.grl import resolve_pallas_mode

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_pallas_mode("auto", deterministic=True) == "v3"
    assert resolve_pallas_mode("auto", deterministic=False) is False
    # explicit modes are never overridden
    assert resolve_pallas_mode("v3", deterministic=False) == "v3"
    assert resolve_pallas_mode(True, deterministic=False) is True
    assert resolve_pallas_mode(False, deterministic=True) is False

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_pallas_mode("auto", deterministic=True) is False
    assert resolve_pallas_mode("auto", deterministic=False) is False


@pytest.fixture
def tiny_grl():
    from dataclasses import replace

    from grlir.models import zoo
    from grlir.models.grl import GRL

    cfg = replace(zoo.GRL_SMALL, embed_dim=32,
                  num_heads_window=(2, 2, 2, 2),
                  num_heads_stripe=(2, 2, 2, 2), depths=(2, 2))
    # depths must match heads tuples
    cfg = replace(cfg, depths=(2, 2), num_heads_window=(2, 2),
                  num_heads_stripe=(2, 2))
    model = GRL(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def _count_pallas(jaxpr) -> int:
    n = 0
    for eqn in jaxpr.eqns:
        if "pallas" in eqn.primitive.name:
            n += 1
        for v in eqn.params.values():
            sub = getattr(v, "jaxpr", None)
            if sub is not None:
                n += _count_pallas(sub)
            if isinstance(v, (list, tuple)):
                for vi in v:
                    sub = getattr(vi, "jaxpr", None)
                    if sub is not None:
                        n += _count_pallas(sub)
    return n


def test_training_trace_has_no_pallas(monkeypatch, tiny_grl):
    """On a (pretend-)TPU backend with the default 'auto' config, a GRAD
    trace must contain zero pallas_calls while the inference trace keeps
    them (the round-4 probe found 32 in the grad trace)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    model, params, x = tiny_grl

    def loss(p, x):
        y = model.apply(p, x, deterministic=False,
                        rngs={"droppath": jax.random.PRNGKey(1)})
        return jnp.sum(y.astype(jnp.float32))

    train_jaxpr = jax.make_jaxpr(jax.grad(loss))(params, x).jaxpr
    assert _count_pallas(train_jaxpr) == 0

    infer_jaxpr = jax.make_jaxpr(
        lambda p, x: model.apply(p, x, deterministic=True))(params, x).jaxpr
    assert _count_pallas(infer_jaxpr) > 0

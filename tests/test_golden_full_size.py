"""Full-size GRL-base golden parity vs the live torch reference (slow).

The fast golden tests (test_golden_forward.py) run reduced geometries
(depth 4, embed 32).  This closes the remaining gap: the REAL GRL-base
(embed 180, depths 4-4-8-8-8-4-4, local_connection) at the published
denoising eval geometry — window 32, anchor down-factor 2, fixed 64x64
stripes (scripts/grl/grl_test.md:46) — forward-matched against the torch
oracle end-to-end, plus a bf16-vs-fp32 gradient sanity bound.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

import oracle
from grlir.models.grl import GRL, GRLConfig
from grlir.utils import convert as C

BASE_EVAL = dict(
    in_channels=3,
    embed_dim=180,
    depths=[4, 4, 8, 8, 8, 4, 4],
    num_heads_window=[3] * 7,
    num_heads_stripe=[3] * 7,
    window_size=32,
    stripe_size=[64, 64],
    stripe_groups=[None, None],
    stripe_shift=True,
    mlp_ratio=2,
    qkv_proj_type="linear",
    anchor_proj_type="avgpool",
    anchor_one_stage=True,
    anchor_window_down_factor=2,
    conv_type="1conv",
    local_connection=True,
    upscale=1,
    upsampler="",
)


def _base_cfg(**extra) -> GRLConfig:
    k = BASE_EVAL
    return GRLConfig(
        in_channels=k["in_channels"],
        embed_dim=k["embed_dim"],
        upscale=k["upscale"],
        upsampler=k["upsampler"],
        depths=tuple(k["depths"]),
        num_heads_window=tuple(k["num_heads_window"]),
        num_heads_stripe=tuple(k["num_heads_stripe"]),
        window_size=k["window_size"],
        stripe_size=tuple(k["stripe_size"]),
        stripe_groups=tuple(k["stripe_groups"]),
        stripe_shift=k["stripe_shift"],
        mlp_ratio=k["mlp_ratio"],
        anchor_window_down_factor=k["anchor_window_down_factor"],
        local_connection=k["local_connection"],
        drop_path_rate=0.0,
        **extra,
    )


@pytest.mark.slow
def test_grl_base_full_size_golden():
    tm = oracle.reference_grl(img_size=64, init_method="n", **BASE_EVAL)
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters())
    # identity-tail (dn) GRL-base; the 20.2M README figure includes the x4
    # pixelshuffle tail (zoo.GRL_BASE, tests/test_grl_model.py)
    assert n_params == 19_805_263

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64))
    x = (np.abs(x) % 1.0).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    model = GRL(_base_cfg())
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = C.convert_torch_state_dict(oracle.state_dict_numpy(tm), template)
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    # 40 transformer blocks of fp32 accumulation: a slightly looser atol
    # than the depth-4 goldens, still ~1e-4-scale agreement on [0,1] data
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_grl_base_bf16_gradient_sanity():
    """bf16-compute gradients must track fp32 gradients on the full model.

    Guards the mixed-precision training path at the real GRL-base scale:
    per-leaf cosine similarity of dL/dparams between compute dtypes.
    """
    cfg32 = _base_cfg()
    cfg16 = _base_cfg(dtype="bfloat16")
    x = jnp.asarray(
        (np.abs(np.random.default_rng(1).standard_normal((1, 64, 64, 3)))
         % 1.0).astype(np.float32))
    y = jnp.asarray(
        (np.abs(np.random.default_rng(2).standard_normal((1, 64, 64, 3)))
         % 1.0).astype(np.float32))

    model32, model16 = GRL(cfg32), GRL(cfg16)
    params = jax.jit(model32.init)(jax.random.PRNGKey(0), x)

    def loss(m):
        def f(p):
            r = m.apply(p, x).astype(jnp.float32)
            return jnp.sqrt(jnp.mean((r - y) ** 2) + 1e-12)
        return f

    g32 = jax.jit(jax.grad(loss(model32)))(params)
    g16 = jax.jit(jax.grad(loss(model16)))(params)

    flat32 = jax.tree_util.tree_leaves(g32)
    flat16 = jax.tree_util.tree_leaves(g16)
    v32 = np.concatenate([np.asarray(l, np.float64).ravel() for l in flat32])
    v16 = np.concatenate([np.asarray(l, np.float64).ravel() for l in flat16])
    cos = v32 @ v16 / max(np.linalg.norm(v32) * np.linalg.norm(v16), 1e-30)
    assert cos > 0.99, f"bf16/fp32 gradient cosine {cos:.4f}"
    # magnitudes agree to ~bf16 relative scale
    ratio = np.linalg.norm(v16) / max(np.linalg.norm(v32), 1e-30)
    assert 0.9 < ratio < 1.1, f"bf16/fp32 gradient norm ratio {ratio:.3f}"

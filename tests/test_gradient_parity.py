"""Gradient parity: d(L1 loss)/d(params) vs the live reference torch model.

Forward parity (test_golden_forward) checks inference; this checks that the
training path — autodiff through every attention pattern, CPB MLP, geometry
gathers and reconstruction tail — produces the same gradients the reference's
autograd does.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

import oracle
from grlir.models.grl import GRL, GRLConfig
from grlir.utils import convert as C


def test_gradients_match_reference():
    kw = dict(
        img_size=32, upscale=2, upsampler="pixelshuffledirect",
        depths=[4], embed_dim=32, num_heads_window=[2], num_heads_stripe=[2],
        window_size=8, stripe_size=[8, None], stripe_groups=[None, 4],
        stripe_shift=True, mlp_ratio=2, anchor_window_down_factor=4,
    )
    tm = oracle.reference_grl(**kw)
    tm.train()

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    y = rng.random((2, 3, 64, 64)).astype(np.float32)

    tx = torch.from_numpy(x)
    ty = torch.from_numpy(y)
    loss_t = torch.nn.functional.l1_loss(tm(tx), ty)
    loss_t.backward()
    torch_grads = {n: p.grad.detach().numpy()
                   for n, p in tm.named_parameters() if p.grad is not None}

    cfg = GRLConfig(
        embed_dim=32, upscale=2, upsampler="pixelshuffledirect", depths=(4,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        stripe_size=(8, None), stripe_groups=(None, 4), stripe_shift=True,
        mlp_ratio=2, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    model = GRL(cfg)
    xin = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), xin)
    params = C.convert_torch_state_dict(oracle.state_dict_numpy(tm), template)

    def loss_fn(p):
        pred = model.apply(p, xin)
        return jnp.mean(jnp.abs(pred - jnp.asarray(y.transpose(0, 2, 3, 1))))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)

    flat = C._flatten(grads["params"])
    checked = 0
    for path, g in flat.items():
        tkey = C.flax_path_to_torch_key(("params",) + path)
        tg = torch_grads.get(tkey)
        assert tg is not None, tkey
        a = np.asarray(g)
        if path[-1] == "kernel":
            tg = tg.T if tg.ndim == 2 else tg.transpose(2, 3, 1, 0)
        scale = max(np.abs(tg).max(), 1e-8)
        np.testing.assert_allclose(a, tg, atol=3e-5 * scale + 1e-8,
                                   err_msg=tkey)
        checked += 1
    assert checked == len(torch_grads)

"""N-step training-trajectory parity vs the live torch reference.

Gradient parity (test_gradient_parity) certifies one backward at init; this
runs the OPTIMIZER AND SCHEDULER IN THE LOOP for 30 steps on identical
weights and batches and asserts the loss trajectory and final parameters
match torch — the strongest training-correctness evidence available without
released checkpoints.  It closes the optax-adam-vs-torch-adam convention gap
(bias correction, eps placement) and the per-step scheduler semantics
(Lightning interval="step", engines/base.py:440-470; MultiStepLRWarmup ramp,
optim/multi_steplr.py:5-39) in one test.

fp32 + exact GELU (the parity numerics, PARITY.md).  The torch side drives
its LR directly from the reference warmup+milestone formula because the
reference's own MultiStepLRWarmup class crashes on modern torch (removed
`verbose` positional arg — same workaround as test_schedules.py).
"""

import numpy as np
import pytest
import torch

import oracle
from grlir.models import blocks


@pytest.fixture(autouse=True)
def _exact_gelu():
    blocks.set_gelu_mode("exact")
    yield
    blocks.set_gelu_mode("auto")


N_STEPS = 30
BASE_LR = 2e-4
MILESTONES = [12, 22]
GAMMA = 0.5
WARMUP_ITER = 6
WARMUP_INIT = 1e-6


def _ref_lr(step: int) -> float:
    """multi_steplr.py:22-30 at interval='step': linear ramp then step decay."""
    if step < WARMUP_ITER:
        return WARMUP_INIT + (BASE_LR - WARMUP_INIT) / WARMUP_ITER * step
    return BASE_LR * GAMMA ** sum(step >= m for m in MILESTONES)


def test_30_step_adam_multisteplr_trajectory():
    import jax
    import jax.numpy as jnp

    from grlir.engines.train import create_state, make_train_step
    from grlir.models.grl import GRL, GRLConfig
    from grlir.optim import build_optimizer, current_lr
    from grlir.optim.schedules import multi_step_warmup
    from grlir.utils import convert as C

    kw = dict(
        img_size=32, upscale=2, upsampler="pixelshuffledirect",
        depths=[4], embed_dim=32, num_heads_window=[2], num_heads_stripe=[2],
        window_size=8, stripe_size=[8, None], stripe_groups=[None, 4],
        stripe_shift=True, mlp_ratio=2, anchor_window_down_factor=4,
    )
    torch.manual_seed(123)
    tm = oracle.reference_grl(**kw)
    tm.train()

    rng = np.random.default_rng(42)
    batches = [
        (rng.random((2, 3, 32, 32)).astype(np.float32),
         rng.random((2, 3, 64, 64)).astype(np.float32))
        for _ in range(N_STEPS)
    ]

    # ---- torch trajectory: Adam + per-step reference LR schedule
    opt_t = torch.optim.Adam(tm.parameters(), lr=BASE_LR,
                             betas=(0.9, 0.999), eps=1e-8)
    losses_t = []
    for step, (x, y) in enumerate(batches):
        for g in opt_t.param_groups:
            g["lr"] = _ref_lr(step)
        opt_t.zero_grad()
        loss = torch.nn.functional.l1_loss(
            tm(torch.from_numpy(x)), torch.from_numpy(y))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # the torch loop mutated tm's weights; convert AFTERWARD from a fresh
    # reference init with the same seed to get the init-time weights
    final_t = oracle.state_dict_numpy(tm)
    torch.manual_seed(123)  # identical RNG stream -> identical init draws
    tm2 = oracle.reference_grl(**kw)
    init_t = oracle.state_dict_numpy(tm2)

    # ---- grlir trajectory: the real engine step (jit, optax, schedule)
    cfg = GRLConfig(
        embed_dim=32, upscale=2, upsampler="pixelshuffledirect", depths=(4,),
        num_heads_window=(2,), num_heads_stripe=(2,), window_size=8,
        stripe_size=(8, None), stripe_groups=(None, 4), stripe_shift=True,
        mlp_ratio=2, anchor_window_down_factor=4, drop_path_rate=0.0,
    )
    model = GRL(cfg)
    xin0 = jnp.asarray(batches[0][0].transpose(0, 2, 3, 1))
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), xin0)
    params = C.convert_torch_state_dict(init_t, template)

    schedule = multi_step_warmup(BASE_LR, MILESTONES, GAMMA,
                                 warmup_iter=WARMUP_ITER,
                                 warmup_init_lr=WARMUP_INIT)
    optimizer = build_optimizer("adam", schedule=schedule,
                                betas=(0.9, 0.999), eps=1e-8)
    state = create_state(params, optimizer)
    step_fn = make_train_step(model, optimizer, {"l1": 1.0}, donate=False)

    losses_j, lrs_j = [], []
    key = jax.random.PRNGKey(0)
    for x, y in batches:
        batch = {"img_lq": jnp.asarray(x.transpose(0, 2, 3, 1)),
                 "img_gt": jnp.asarray(y.transpose(0, 2, 3, 1))}
        state, metrics = step_fn(state, batch, key)
        # inject_hyperparams stores the lr the update CONSUMED (schedule at
        # the pre-increment count) — read after the step
        lrs_j.append(current_lr(state.opt_state))
        losses_j.append(float(metrics["loss"]))

    # per-step LR parity (scheduler-in-the-loop semantics)
    np.testing.assert_allclose(
        lrs_j, [_ref_lr(i) for i in range(N_STEPS)], rtol=1e-6)

    # per-step loss parity: fp32 autodiff noise compounds through adam's
    # sqrt + normalization, so allow growth with step index
    for i, (lt, lj) in enumerate(zip(losses_t, losses_j)):
        assert lj == pytest.approx(lt, rel=3e-4 + 3e-5 * i), (
            f"step {i}: torch {lt} vs grlir {lj}")

    # the trajectories must actually train (warmup ramp -> real updates)
    assert losses_t[-1] < losses_t[0] * 0.9

    # final-parameter drift: compare every tensor after 30 updates
    flat = C._flatten(state.params["params"])
    checked = 0
    for path, v in flat.items():
        tkey = C.flax_path_to_torch_key(("params",) + path)
        tv = final_t.get(tkey)
        if tv is None:  # converter-synthesized entries have no torch twin
            continue
        a = np.asarray(v)
        if path[-1] == "kernel":
            tv = tv.T if tv.ndim == 2 else tv.transpose(2, 3, 1, 0)
        # adam normalizes every update to ~lr regardless of gradient size, so
        # fp32 noise can walk a param by a fraction of the CUMULATIVE lr even
        # when the param itself is tiny (cpb biases ~1e-3).  Bound drift by
        # 1e-3 x max(tensor scale, sum of lrs) — measured worst: 1.1e-6 abs
        # on cpb_mlp bias vs cum_lr 3.1e-3
        cum_lr = sum(_ref_lr(i) for i in range(N_STEPS))
        scale = max(np.abs(tv).max(), cum_lr)
        np.testing.assert_allclose(a, tv, atol=1e-3 * scale, err_msg=tkey)
        checked += 1
    assert checked >= 50, checked

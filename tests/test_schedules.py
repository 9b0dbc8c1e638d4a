"""LR schedule parity vs the reference torch schedulers."""

import numpy as np
import pytest
import torch

import oracle
from grlir.optim import schedules as S


def _torch_lr_sequence(scheduler, optimizer, steps):
    lrs = []
    for _ in range(steps):
        lrs.append(optimizer.param_groups[0]["lr"])
        optimizer.step()
        scheduler.step()
    return np.array(lrs)


def test_multi_step_warmup_matches_torch():
    # NB the reference's MultiStepLRWarmup passes the removed `verbose` arg
    # positionally and crashes on modern torch, so oracle against torch's own
    # MultiStepLR with the warmup line applied manually
    # (multi_steplr.py:24-30: linear ramp for last_epoch < warmup_iter).
    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.Adam(p, lr=2e-4)
    sch = torch.optim.lr_scheduler.MultiStepLR(opt, [30, 60, 80], 0.5)
    base = _torch_lr_sequence(sch, opt, 100)
    warm = np.array([1e-6 + (2e-4 - 1e-6) / 10 * i for i in range(10)])
    want = base.copy()
    want[:10] = warm
    mine = S.multi_step_warmup(2e-4, "30+60+80", 0.5, 10, 1e-6)
    got = np.array([float(mine(i)) for i in range(100)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cosine_restart_matches_reference():
    ref = oracle.reference_module("optim.lr_scheduler")
    p = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.Adam(p, lr=3e-4)
    sch = ref.CosineAnnealingRestartCyclicLR(
        opt, periods=[40, 30], restart_weights=[1, 0.5],
        eta_mins=[1e-6, 1e-7])
    want = _torch_lr_sequence(sch, opt, 70)
    mine = S.cosine_annealing_restart_cyclic(3e-4, [40, 30], [1, 0.5],
                                             [1e-6, 1e-7])
    got = np.array([float(mine(i)) for i in range(70)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_parse_milestones():
    assert S.parse_milestones("100+200+300") == [100, 200, 300]
    assert S.parse_milestones([5, 10]) == [5, 10]


def test_step_lr():
    f = S.step_lr(1e-3, 10, 0.5)
    assert float(f(0)) == pytest.approx(1e-3)
    assert float(f(10)) == pytest.approx(5e-4)
    assert float(f(25)) == pytest.approx(2.5e-4)


def test_warmup_cosine_endpoints():
    f = S.warmup_cosine(2e-4, t_initial=1000, lr_min=1e-5,
                        warmup_lr_init=1e-5, warmup_t=100)
    assert float(f(0)) == pytest.approx(1e-5)
    assert float(f(100)) == pytest.approx(2e-4, rel=1e-3)
    assert float(f(1000)) == pytest.approx(1e-5, rel=1e-3)

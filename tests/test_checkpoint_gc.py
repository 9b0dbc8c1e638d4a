"""Checkpoint GC: keep-best-k retention + best/latest restore (NEXT.md item).

Mirrors Lightning ModelCheckpoint(save_top_k, monitor, mode) semantics
(reference config/defaults.yaml:28-32) on the orbax manager: old checkpoints
are garbage-collected, the best-by-monitor survive, and the latest is always
restorable for resume.
"""

import numpy as np
import pytest

from grlir.utils.checkpoint import CheckpointManager


def _state(step, val):
    return {
        "step": np.asarray(step, np.int32),
        "params": {"w": np.full((4, 4), val, np.float32)},
    }


def test_keep_best_k_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path), monitor="val_psnr", mode="max",
                            save_top_k=2)
    scores = {1: 30.0, 2: 35.0, 3: 32.0, 4: 31.0, 5: 34.0}
    for step, s in scores.items():
        mgr.save(step, _state(step, s), metrics={"val_psnr": s})

    kept = sorted(mgr._mgr.all_steps())
    # GC actually ran: not all 5 survive
    assert len(kept) < 5
    # the best checkpoint by the monitored metric survives
    assert 2 in kept, f"best step GC'd: kept={kept}"
    # the latest is restorable for resume
    assert mgr.latest_step() == 5
    restored = mgr.restore(_state(0, 0.0))
    assert int(restored["step"]) == 5
    np.testing.assert_allclose(restored["params"]["w"], 34.0)
    # restoring the best explicitly round-trips its payload
    best = mgr.restore(_state(0, 0.0), step=2)
    np.testing.assert_allclose(best["params"]["w"], 35.0)
    mgr.close()


def test_min_mode_keeps_lowest(tmp_path):
    """mode=min (e.g. monitoring NIQE in the BSR GAN stage)."""
    mgr = CheckpointManager(str(tmp_path), monitor="val_niqe", mode="min",
                            save_top_k=1)
    for step, s in {1: 6.0, 2: 4.0, 3: 5.5, 4: 5.8}.items():
        mgr.save(step, _state(step, s), metrics={"val_niqe": s})
    kept = sorted(mgr._mgr.all_steps())
    assert 2 in kept, f"lowest-NIQE step GC'd: kept={kept}"
    assert len(kept) < 4
    mgr.close()


def test_save_without_metrics_survives(tmp_path):
    """Periodic saves with no validation metrics must not crash GC."""
    mgr = CheckpointManager(str(tmp_path), save_top_k=1)
    for step in (1, 2, 3):
        mgr.save(step, _state(step, 0.0))
    assert mgr.latest_step() == 3
    restored = mgr.restore(_state(0, 0.0))
    assert int(restored["step"]) == 3
    mgr.close()

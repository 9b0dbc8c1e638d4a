"""Profiling/observability utilities (SURVEY.md §2.2 epoch-timer parity +
TPU-native roofline helpers)."""

import json

import jax.numpy as jnp
import numpy as np

from grlir.utils.profiling import (MetricsLogger, StepTimer, cost_analysis,
                                   device_memory_stats)


def test_cost_analysis_flops_scale_with_size():
    def f(a, b):
        return a @ b

    small = cost_analysis(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    big = cost_analysis(f, jnp.ones((128, 128)), jnp.ones((128, 128)))
    assert small["flops"] > 0
    # matmul flops grow 8x when both dims double
    assert 4 < big["flops"] / small["flops"] <= 16
    assert big["bytes_accessed"] > small["bytes_accessed"]
    assert big["arithmetic_intensity"] > 0


def test_step_timer_rolls():
    t = StepTimer(window=4)
    assert t.steps_per_sec == 0.0
    for _ in range(6):
        t.tick()
    assert len(t._times) == 4
    assert t.steps_per_sec > 0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = MetricsLogger(path)
    lg.log(1, loss=0.5, psnr=np.float32(30.25))
    lg.log(2, loss=0.25)
    lg.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["psnr"] == 30.25
    assert lines[1]["loss"] == 0.25


def test_device_memory_stats_shape():
    stats = device_memory_stats()  # may be empty on CPU backend
    for v in stats.values():
        assert "bytes_in_use_mb" in v

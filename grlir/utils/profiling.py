"""Profiling/observability hooks.

The reference only has wall-clock epoch timers + peak-GPU-memory log lines
(engines/base.py:556-597, :353).  TPU-native equivalents: jax.profiler traces
(viewable in TensorBoard/Perfetto), device memory stats, per-step timing, and
compiled-program cost analysis (FLOPs / HBM bytes) for roofline checks.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in MB (when the backend exposes them)."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            }
    return out


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs and HBM bytes of the compiled program (roofline inputs)."""
    compiled = jax.jit(fn).lower(*args).compile()
    c = compiled.cost_analysis() or {}
    return {
        "flops": float(c.get("flops", 0.0)),
        "bytes_accessed": float(c.get("bytes accessed", 0.0)),
        "arithmetic_intensity": (
            float(c.get("flops", 0.0)) / max(float(c.get("bytes accessed", 1.0)), 1.0)
        ),
    }


class StepTimer:
    """Rolling steps/sec + wall-time tracker (epoch-timer equivalent)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []

    def tick(self):
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        return (len(self._times) - 1) / (self._times[-1] - self._times[0])


class MetricsLogger:
    """JSONL scalar logger (TensorBoardLogger stand-in; one line per event —
    trivially plottable and greppable)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

"""Per-image metric accumulation with exactly-once dedup averaging.

The reference keeps per-image (value, idx) states with dist cat-reduce and
dedups by index at compute time to neutralize DistributedSampler padding
duplicates (utils/metrics/psnr.py:19-41).  Same design here: shards can push
overlapping (value, idx) pairs; `compute` keeps the first occurrence of each
index.  Multi-host eval gathers per-shard vectors via process_allgather.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Iterable, List, Sequence

import numpy as np


def dedup_average(values: np.ndarray, idx: np.ndarray) -> float:
    """Average keeping the first value per unique index (psnr.py:19-41)."""
    seen = OrderedDict()
    for v, i in zip(np.asarray(values).ravel(), np.asarray(idx).ravel()):
        if i not in seen:
            seen[i] = v
    return float(sum(seen.values()) / len(seen))


class MetricAccumulator:
    """Accumulates named per-image metric vectors tagged with sample indices."""

    def __init__(self, names: Sequence[str]):
        self.names = list(names)
        self.reset()

    def reset(self):
        self._values: Dict[str, List[np.ndarray]] = {n: [] for n in self.names}
        self._idx: List[np.ndarray] = []
        self._files: List[str] = []

    def update(self, values: Dict[str, np.ndarray], idx, filenames=None):
        for n in self.names:
            self._values[n].append(np.atleast_1d(np.asarray(values[n])))
        self._idx.append(np.atleast_1d(np.asarray(idx)))
        if filenames is not None:
            self._files.extend(
                [filenames] if isinstance(filenames, str) else list(filenames)
            )

    def gather_across_hosts(self):
        """All-gather (value, idx) vectors across JAX processes; dedup in
        compute() preserves exactly-once semantics (SURVEY.md §5)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        for n in self.names:
            local = np.concatenate(self._values[n]) if self._values[n] else np.zeros(0)
            self._values[n] = [
                np.concatenate(multihost_utils.process_allgather(local))
            ]
        local_idx = np.concatenate(self._idx) if self._idx else np.zeros(0, np.int64)
        self._idx = [np.concatenate(multihost_utils.process_allgather(local_idx))]

    def compute(self) -> Dict[str, float]:
        idx = np.concatenate(self._idx) if self._idx else np.zeros(0, np.int64)
        return {
            n: dedup_average(np.concatenate(self._values[n]), idx)
            for n in self.names
            if self._values[n]
        }

    def per_image_table(self) -> str:
        """Per-image metric text block (engines/base.py print_per_image_metric)."""
        lines = ["Filename\t" + "\t".join(self.names)]
        idx = np.concatenate(self._idx) if self._idx else np.zeros(0)
        vals = {n: np.concatenate(self._values[n]) for n in self.names if self._values[n]}
        for i in range(len(idx)):
            name = self._files[i] if i < len(self._files) else str(int(idx[i]))
            row = "\t".join(f"{vals[n][i]:.4f}" for n in self.names if n in vals)
            lines.append(f"{name:20}\t{row}")
        return "\n".join(lines) + "\n"

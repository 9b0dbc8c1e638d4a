"""Dataset wrappers (data/datasets/dataset_wrappers.py equivalent)."""

from __future__ import annotations


class RepeatDataset:
    """Virtual length multiplier (dataset_wrappers.py:1-34)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, index):
        return self.dataset[index % len(self.dataset)]

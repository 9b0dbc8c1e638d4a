"""Process-worker DataLoader (worker_mode="process"): ordering, error
propagation, per-worker rng decorrelation, and pool reuse across epochs.
Reference equivalent: torch DataLoader worker processes
(data/data_module/ir_data_module.py:69-88)."""

import numpy as np
import pytest

from grlir.data.loader import DataLoader


class ToyDataset:
    """Deterministic content keyed by index; picklable by value."""

    def __init__(self, n=12):
        self.n = n
        self.rng = np.random.default_rng(0)
        self.seeded_with = None

    def seed(self, seed):
        self.rng = np.random.default_rng(seed)
        self.seeded_with = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"img": np.full((2, 2, 3), i, np.float32),
                "indices": np.array([i]),
                "filenames": f"f{i}.png"}


class FailingDataset(ToyDataset):
    def __getitem__(self, i):
        if i == 3:
            raise RuntimeError("bad sample 3")
        return super().__getitem__(i)


class RngDataset(ToyDataset):
    def __getitem__(self, i):
        return {"v": self.rng.random(4).astype(np.float32),
                "indices": np.array([i])}


@pytest.fixture(scope="module")
def _mp_guard():
    yield


def test_process_loader_order_and_content():
    dl = DataLoader(ToyDataset(10), batch_size=2, shuffle=False,
                    num_workers=2, worker_mode="process")
    try:
        batches = list(dl)
        assert len(batches) == 5
        for b_i, batch in enumerate(batches):
            assert batch["img"].shape == (2, 2, 2, 3)
            np.testing.assert_array_equal(
                batch["indices"].ravel(), [2 * b_i, 2 * b_i + 1])
            assert batch["filenames"] == [f"f{2*b_i}.png", f"f{2*b_i+1}.png"]
        # epoch 2 reuses the pool (no respawn): same result
        again = list(dl)
        assert len(again) == 5
    finally:
        dl.close()


def test_process_loader_matches_thread_loader():
    kw = dict(batch_size=3, shuffle=True, drop_last=True, seed=7)
    dl_t = DataLoader(ToyDataset(10), num_workers=2, worker_mode="thread", **kw)
    dl_p = DataLoader(ToyDataset(10), num_workers=2, worker_mode="process", **kw)
    try:
        for bt, bp in zip(dl_t, dl_p):
            np.testing.assert_array_equal(bt["img"], bp["img"])
            np.testing.assert_array_equal(bt["indices"], bp["indices"])
    finally:
        dl_p.close()


def test_process_loader_propagates_worker_error():
    dl = DataLoader(FailingDataset(6), batch_size=2, num_workers=2,
                    worker_mode="process")
    try:
        with pytest.raises(RuntimeError, match="bad sample 3"):
            list(dl)
    finally:
        dl.close()


def test_process_workers_decorrelated_rng():
    """Each worker unpickles an identical dataset; _worker_init must reseed so
    stochastic degradations differ across workers."""
    dl = DataLoader(RngDataset(8), batch_size=1, num_workers=4, prefetch=8,
                    worker_mode="process")
    try:
        vals = [b["v"][0] for b in dl]
        uniq = {tuple(np.round(v, 6)) for v in vals}
        # without reseeding every worker would emit the same leading stream;
        # with pid-keyed seeding >=2 distinct streams must appear
        assert len(uniq) >= 2
    finally:
        dl.close()


def test_infinite_stream_process_mode():
    dl = DataLoader(ToyDataset(4), batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2, worker_mode="process")
    try:
        stream = dl.infinite()
        seen = [next(stream) for _ in range(5)]  # crosses epoch boundary
        assert all(b["img"].shape == (2, 2, 2, 3) for b in seen)
    finally:
        dl.close()


def test_process_worker_seeding_reproducible():
    """Worker seeds are worker-id-keyed (torch semantics), not pid-keyed:
    two runs with the same base seed must produce the same multiset of
    random streams."""
    def collect():
        dl = DataLoader(RngDataset(8), batch_size=1, num_workers=2,
                        prefetch=8, worker_mode="process", seed=123)
        try:
            return sorted(tuple(np.round(b["v"][0], 6)) for b in dl)
        finally:
            dl.close()

    assert collect() == collect()

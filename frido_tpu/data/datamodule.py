"""Batching + data module.

Replaces the reference's torch DataLoader + ``custom_collate``
(``/root/reference/taming/data/utils.py:162-203``, ``main.py:251-313``):
numpy batch assembly where ragged fields (annotation lists, caption strings)
stay as Python lists, a threaded prefetching loader, and the deterministic
test-split sharding used by multi-device inference (``main.py:301-313``:
``random_split`` with generator seed 42).
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from frido_tpu.config import instantiate_from_config


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack arrays/scalars; pass ragged values (lists of Annotations,
    strings) through as lists — the custom_collate semantics."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        v0 = vals[0]
        if isinstance(v0, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def split_indices_deterministic(n: int, n_split: int, idx: int,
                                seed: int = 42) -> List[int]:
    """torch ``random_split(lengths, Generator().manual_seed(42))``
    equivalent: a seeded permutation chopped into n_split near-equal chunks.
    (Uses numpy's RNG — deterministic across runs of this framework; the
    grouping guarantees disjoint full coverage like the reference.)"""
    lengths = [n // n_split] * n_split
    for i in range(n - sum(lengths)):
        lengths[i] += 1
    perm = np.random.RandomState(seed).permutation(n)
    start = sum(lengths[:idx])
    return sorted(perm[start:start + lengths[idx]].tolist())


class DataLoader:
    """Threaded prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 seed: int = 0, indices: Optional[Sequence[int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.indices = (list(indices) if indices is not None
                        else list(range(len(dataset))))
        self.epoch = 0
        self._skip_batches = 0

    def __len__(self):
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_cursor(self, epoch: int, batch_in_epoch: int = 0) -> None:
        """Deterministic mid-epoch resume: the next ``__iter__`` replays
        epoch ``epoch``'s shuffle order and skips the first
        ``batch_in_epoch`` batches (they were consumed before the
        checkpoint). The cursor is persisted in the train checkpoint's
        ``last.json`` — the reference gets this from Lightning's loader
        state (``main.py:630``)."""
        self.epoch = epoch
        self._skip_batches = batch_in_epoch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = list(self.indices)
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self._skip_batches:
            batches = batches[self._skip_batches:]
            self._skip_batches = 0

        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[i] for i in b])
            return

        from concurrent.futures import ThreadPoolExecutor

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, b))
                    q.put(collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


class DataModuleFromConfig:
    """``main.py:251-313``: wraps dataset configs into loaders; the test
    split can be sharded into ``n_split_dataset`` deterministic groups for
    multi-host inference."""

    def __init__(self, batch_size: int, train: Optional[Dict] = None,
                 validation: Optional[Dict] = None,
                 test: Optional[Dict] = None, wrap: bool = False,
                 num_workers: Optional[int] = None,
                 n_split_dataset: int = -1, idx_split_dataset: int = -1,
                 **unused):
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None else batch_size * 2
        self.dataset_configs = {}
        if train is not None:
            self.dataset_configs["train"] = train
        if validation is not None:
            self.dataset_configs["validation"] = validation
        if test is not None:
            self.dataset_configs["test"] = test
        self.n_split_dataset = n_split_dataset
        self.idx_split_dataset = idx_split_dataset
        self.datasets: Dict[str, Any] = {}

    def setup(self):
        for k, cfg in self.dataset_configs.items():
            self.datasets[k] = instantiate_from_config(cfg)
        return self

    def _dataset(self, split):
        if split not in self.datasets:
            self.setup()
        return self.datasets[split]

    def train_dataloader(self) -> DataLoader:
        # one persistent loader: its epoch counter drives the per-epoch
        # shuffle, so re-iterating must NOT rebuild it (a fresh loader
        # would replay epoch 0's order forever)
        if not hasattr(self, "_train_loader"):
            self._train_loader = DataLoader(
                self._dataset("train"), self.batch_size, shuffle=True,
                num_workers=self.num_workers, drop_last=True)
        return self._train_loader

    def val_dataloader(self) -> DataLoader:
        return DataLoader(self._dataset("validation"), self.batch_size,
                          shuffle=False, num_workers=self.num_workers)

    def test_dataloader(self) -> DataLoader:
        ds = self._dataset("test")
        indices = None
        if self.n_split_dataset != -1:
            assert 0 <= self.idx_split_dataset < self.n_split_dataset
            indices = split_indices_deterministic(
                len(ds), self.n_split_dataset, self.idx_split_dataset)
        return DataLoader(ds, self.batch_size, shuffle=False,
                          num_workers=self.num_workers, indices=indices)

"""Host-side batching/prefetch loader.

Replaces the reference's torch DataLoader + DistributedSampler
(datasets/data_loaders.py, train.py:46-68): per-epoch seeded shuffle, per-host
contiguous index shard (the per-host input pipeline for multi-host TPU),
barrel re-mapping so every batch shares one crop-size bucket
(dtu_dataset_ms.py reset_dataset), threaded prefetch, numpy collation.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples):
    """Stack a list of sample dicts into one batch dict (numpy)."""
    out = {}
    first = samples[0]
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = collate([s[k] for s in samples])
        elif isinstance(v, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class MVSLoader:
    """Epoch-based iterator with seeded shuffling and threaded prefetch."""

    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 num_workers=4, seed=0, host_id=0, num_hosts=1, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle + re-barrel for the epoch (DistributedSampler.set_epoch +
        dataset.reset_dataset, mvsformer_trainer.py:57-58)."""
        self._epoch = epoch
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + epoch)
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        # Pad so every host gets the same count (DistributedSampler semantics).
        per_host = -(-n // self.num_hosts)
        padded = np.concatenate([idx, idx[: per_host * self.num_hosts - n]])
        self._host_idx = padded[self.host_id::self.num_hosts]
        if hasattr(self.dataset, "reset_dataset"):
            # Barrel mapping runs over THIS host's index order with the
            # per-host batch size, so every local batch shares one crop-size
            # bucket (the reference's per-rank reset_dataset semantics,
            # dtu_dataset_ms.py:118-133).
            self.dataset.batch_size = self.batch_size
            self.dataset.reset_dataset(self._host_idx)

    def __len__(self):
        if not hasattr(self, "_host_idx"):
            self.set_epoch(0)
        n = len(self._host_idx)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        if not hasattr(self, "_host_idx"):
            self.set_epoch(self._epoch)
        idx = self._host_idx
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b.tolist()))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

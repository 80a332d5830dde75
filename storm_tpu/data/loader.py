"""Batching iterator with background-thread prefetch.

Replaces the reference's torch DataLoader worker pools
(sgmse/data_module.py:246-265). Host work per item is tiny (wav read +
crop), so a small thread pool with double-buffered prefetch keeps the one
host core busy while the device computes; the STFT itself runs on device.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


class DataLoader:
    """Iterates (x, y) numpy batches of shape (B, C, T) -> squeezed (B, T)
    when spatial_channels == 1."""

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        squeeze_channels: bool = True,
        shard: tuple = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self._epoch = 0
        self.squeeze_channels = squeeze_channels
        # multi-host data parallelism (torch DistributedSampler analogue,
        # reference train.py:150 DDP): `batch_size` stays GLOBAL; process
        # p of n loads only its contiguous row-slice of every global
        # batch. The shuffle permutation is a pure function of
        # (seed, epoch) on every process, so the union of the shards IS
        # the single-process batch stream — loss equality with
        # single-process training holds exactly at the same global batch.
        self.process_index, self.process_count = shard
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"{self.process_count} processes"
            )
        self.local_batch_size = batch_size // self.process_count

    def set_epoch(self, epoch: int):
        """Pin the shuffle order for the given epoch (torch
        DistributedSampler-style): the permutation is a pure function of
        (seed, epoch), so a resumed run replays the exact same batch order
        — part of the resume-fidelity contract of train.py."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, items):
        xs = np.stack([it[0] for it in items])
        ys = np.stack([it[1] for it in items])
        if self.squeeze_channels and xs.ndim == 3 and xs.shape[1] == 1:
            xs, ys = xs[:, 0], ys[:, 0]
        extras = [it[2:] for it in items if len(it) > 2]
        if extras:
            return (xs, ys) + tuple(zip(*extras))
        return xs, ys

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # consume the current epoch and advance it, so iterating without
            # set_epoch still reshuffles every epoch
            epoch, self._epoch = self._epoch, self._epoch + 1
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
            # pin the dataset's crop randomness to the same epoch so crops
            # are (seed, i, epoch)-pure across processes and resumes
            if hasattr(self.dataset, "set_epoch"):
                self.dataset.set_epoch(epoch)
        end = (
            len(idx) - len(idx) % self.batch_size
            if self.drop_last
            else len(idx)
        )
        lo = self.process_index * self.local_batch_size
        for i in range(0, end, self.batch_size):
            g = idx[i : i + self.batch_size]
            if self.process_count > 1 and len(g) < self.batch_size:
                # ragged global tail (drop_last=False): pad the INDEX list
                # by repeating the last entry so every process still gets a
                # full local slice — the consumer masks rows past the real
                # global count (train.py val loop), keeping batch counts
                # and shapes identical across processes
                g = np.concatenate(
                    [g, np.full(self.batch_size - len(g), g[-1], g.dtype)]
                )
            yield g[lo : lo + self.local_batch_size]

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in self._batches():
                    items = list(
                        pool.map(self.dataset.__getitem__, batch_idx)
                    )
                    q.put(self._collate(items))
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()

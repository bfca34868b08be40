"""Batch loader with background prefetch — replaces larcv3's threaded
queue_interface / distributed_queue_interface
(/root/reference/src/io/larcv_fetcher.py:59-77,263-277): double-buffered
random/serial event batching with per-host sharding.

The larcv C++ engine prefetches the *next* batch while the current one
trains (prepare_next, larcv_fetcher.py:403-413); here a host thread does the
same, filling a bounded queue so device steps and host IO overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from ..config.schema import AccessMode


class BatchLoader:
    """Infinite iterator of batch dicts with background prefetch.

    dataset must expose __len__ and batch(indices) -> dict (SyntheticDataset
    or LarcvDataset).  In distributed runs each host reads its own shard
    (process_index/process_count split, replacing distributed_queue_interface).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        access_mode: AccessMode = AccessMode.random_events,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        transform: Optional[Callable[[Dict], Dict]] = None,
        start_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.access_mode = access_mode
        self.transform = transform
        n = len(dataset)
        # per-host contiguous shard (same event-partitioning contract as the
        # reference's distributed read_option="read_from_all_ranks_mpi")
        shard = np.array_split(np.arange(n), process_count)[process_index]
        if len(shard) == 0:
            shard = np.arange(n)
        self.indices = shard
        self.rng = np.random.default_rng(seed if seed >= 0 else None)
        self._cursor = start_index % max(len(shard), 1)
        # epoch permutation for random_events: every event is seen exactly
        # once per pass (larcv random_events epoch semantics; r1 drew with
        # rng.choice per batch, which repeats events within an epoch)
        self._perm: Optional[np.ndarray] = None
        self._perm_pos = 0
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def __len__(self) -> int:
        return max(len(self.indices) // self.batch_size, 1)

    def _next_indices(self) -> np.ndarray:
        if self.access_mode == AccessMode.serial_access:
            idx = np.array(
                [
                    self.indices[(self._cursor + i) % len(self.indices)]
                    for i in range(self.batch_size)
                ]
            )
            self._cursor = (self._cursor + self.batch_size) % len(self.indices)
            return idx
        # random_events / random_blocks
        if self.access_mode == AccessMode.random_blocks:
            start = int(self.rng.integers(0, len(self.indices)))
            return np.array(
                [
                    self.indices[(start + i) % len(self.indices)]
                    for i in range(self.batch_size)
                ]
            )
        # random_events: consume a fresh per-epoch permutation (batches may
        # straddle the epoch boundary when n % batch_size != 0)
        out = np.empty(self.batch_size, dtype=self.indices.dtype)
        filled = 0
        while filled < self.batch_size:
            if self._perm is None or self._perm_pos >= len(self._perm):
                self._perm = self.rng.permutation(self.indices)
                self._perm_pos = 0
            take = min(
                self.batch_size - filled, len(self._perm) - self._perm_pos
            )
            out[filled : filled + take] = self._perm[
                self._perm_pos : self._perm_pos + take
            ]
            self._perm_pos += take
            filled += take
        return out

    def _worker(self):
        while not self._stop.is_set():
            idx = self._next_indices()
            batch = self.dataset.batch(idx)
            if self.transform is not None:
                batch = self.transform(batch)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict]:
        return self

    def __next__(self) -> Dict:
        return self._q.get()

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

"""Per-event host-plan cache.

Window plans are pure functions of an event's (static) voxel coordinates
and the plan geometry, and the native builder packs them as per-event
slices along the leading batch axis (io/_hostio.cpp build_window_plans).
Training revisits every event once per epoch (BatchLoader's per-epoch
permutation), so rebuilding plans each epoch wastes ~90 ms/event of the
single host core — nearly 3x the device step at dune3d scale (PERF_NOTES
r3 e2e attribution).  This cache stores each event's plan slice on first
build and assembles later batches by concatenation (~ms), making steady-
state epochs device-bound.

The reference has no analog only because its GPU engine (SCN) builds
rulebooks on-device per batch; here plan building is host work by design
(the device never pays for it), so memoizing it is the host-side half of
the same contract (/root/reference/src/io/larcv_fetcher.py:403-413 —
keep the device busy).

Invalidation: keys are (split, event_index, coords_digest) against the
event's actual coordinate bytes — a crc32 digest guards against any path
that perturbs coordinates per draw (e.g. a future augmentation on the
supervised tasks) silently serving stale plans (ADVICE r3).  The digest
costs ~0.1 ms/event at dune3d occupancy, noise next to assembly.
Budget-bounded: once ``max_bytes`` is reached new events are built but not
stored (first-come-stay beats LRU under uniform per-epoch reuse, where
LRU always evicts an entry right before its next hit).
"""

from __future__ import annotations

import threading
import zlib
from typing import Callable, Dict, Sequence

import numpy as np


class PlanCache:
    def __init__(
        self,
        build_fn: Callable[[np.ndarray], Dict[str, np.ndarray]],
        max_bytes: int,
    ):
        self._build = build_fn
        self.max_bytes = int(max_bytes)
        self._store: Dict[tuple, Dict[str, np.ndarray]] = {}
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @property
    def nbytes(self) -> int:
        return self._bytes

    def clear(self) -> None:
        """Drop every stored plan and reset counters (benchmarks use this
        to measure a genuinely cold first epoch)."""
        with self._lock:
            self._store.clear()
            self._bytes = 0
            self.hits = 0
            self.misses = 0

    def __len__(self) -> int:
        return len(self._store)

    def stats_line(self) -> str:
        """One-line summary for the per-epoch trainer log (ADVICE r3)."""
        total = self.hits + self.misses
        rate = self.hits / total if total else 0.0
        return (
            f"plan cache: {len(self)} events, "
            f"{self._bytes / (1 << 20):.0f}/{self.max_bytes / (1 << 20):.0f} MB, "
            f"hit rate {rate:.1%} ({self.hits}/{total})"
        )

    def plans_for(
        self, split: str, coords: np.ndarray, indices: Sequence[int]
    ) -> Dict[str, np.ndarray]:
        """Batch plan dict for ``coords`` ([B, N, 3] i32), cached per event.

        Exactly equal to ``build_fn(coords)``: the builder is per-event and
        every packed array's leading axis is the batch, so slicing and
        re-concatenating is the identity (tests/test_plan_cache.py).
        """
        idx = np.asarray(indices).ravel()
        if len(idx) != coords.shape[0]:
            raise ValueError(
                f"indices ({len(idx)}) must match batch rows "
                f"({coords.shape[0]})"
            )
        coords = np.ascontiguousarray(coords)
        keys = [
            (split, int(i), zlib.crc32(coords[p].tobytes()))
            for p, i in enumerate(idx)
        ]
        with self._lock:
            miss_pos = [p for p, k in enumerate(keys) if k not in self._store]
            self.hits += len(keys) - len(miss_pos)
            self.misses += len(miss_pos)
            fresh: Dict[int, Dict[str, np.ndarray]] = {}
            if miss_pos:
                built = self._build(
                    np.ascontiguousarray(coords[miss_pos])
                )
                for row, p in enumerate(miss_pos):
                    ev = {k: v[row : row + 1] for k, v in built.items()}
                    fresh[p] = ev
                    size = sum(a.nbytes for a in ev.values())
                    if self._bytes + size <= self.max_bytes:
                        # own copies: decouple from the batch-sized parents
                        self._store[keys[p]] = {
                            k: np.ascontiguousarray(a) for k, a in ev.items()
                        }
                        self._bytes += size
            if not miss_pos:
                plan_keys = self._store[keys[0]].keys()
            else:
                plan_keys = fresh[miss_pos[0]].keys()
            return {
                k: np.concatenate(
                    [
                        fresh[p][k] if p in fresh else self._store[keys[p]][k]
                        for p in range(len(keys))
                    ],
                    axis=0,
                )
                for k in plan_keys
            }

"""Cross-request scan batching: coalesce concurrent searches into one scan.

The TPU's scan cost is nearly flat in the query count until the MXU
saturates (one 2048-query fused scan costs ~the same HBM traffic as a
1-query scan — the corpus read dominates), so serving throughput under
concurrent load comes from batching *across* RPCs, not from running many
1-query scans side by side. The reference has no equivalent (its goroutine
model runs one full scan per request, edge/edge.go:610); this is the
continuous-query-batching layer of the TPU design (SURVEY.md §7 phase 8).

Mechanics: requests for the same (collection, scan-parameter) group enqueue
under a lock; the first waiter becomes the *leader*, waits up to
``max_wait_s`` for followers (returning early when ``max_batch`` rows
accumulate), then runs ONE stacked scan and distributes row slices.
Followers block on an event. Worst-case added latency is ``max_wait_s``
(default 2 ms — small against a 1M-row scan, invisible under load because
a full batch departs immediately). Filtered searches (per-request
candidate sets) do not batch — they take the direct path in the engine.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Hashable, List, Optional, Tuple

import numpy as np


@dataclass
class _Pending:
    vector: np.ndarray          # [D]
    k: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Tuple[np.ndarray, np.ndarray]] = None
    error: Optional[BaseException] = None


class ScanBatcher:
    """Groups concurrent scan requests by key and runs one scan per group.

    ``scan_fn(queries [Q, D], k) -> (scores [Q, >=k], ids [Q, >=k])`` is
    supplied per call (it closes over the store and scan params); the key
    must change whenever scan_fn's behavior would (collection identity,
    quantization epoch, approx/fused flags, metric).
    """

    def __init__(self, max_batch: int = 2048, max_wait_s: float = 0.002):
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_s)
        self._lock = threading.Lock()
        self._queues: Dict[Hashable, List[_Pending]] = {}
        self._generation: Dict[Hashable, int] = {}
        # observability: how many scans were saved by coalescing
        self.batches_run = 0
        self.requests_served = 0

    def run(
        self,
        key: Hashable,
        scan_fn: Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]],
        vector: np.ndarray,
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Submit one query row; returns its ``(scores [1, k], ids [1, k])``."""
        me = _Pending(vector=np.asarray(vector, np.float32).reshape(-1), k=int(k))
        with self._lock:
            queue = self._queues.setdefault(key, [])
            queue.append(me)
            leader = len(queue) == 1

        if not leader:
            me.done.wait()
            if me.error is not None:
                raise me.error
            return me.result

        # leader: give followers a short window to pile in
        deadline = time.monotonic() + self.max_wait_s
        while True:
            with self._lock:
                if len(self._queues[key]) >= self.max_batch:
                    break
            now = time.monotonic()
            if now >= deadline:
                break
            time.sleep(min(deadline - now, 0.0002))

        with self._lock:
            batch = self._queues.pop(key)
            self._queues[key] = []
            # anything enqueued after this point starts a new group
        try:
            queries = np.stack([p.vector for p in batch])
            kk = max(p.k for p in batch)
            # pad the stacked batch to a power-of-two row count: otherwise
            # every distinct coalesced size compiles a fresh scan program
            # (measured as multi-second p99 spikes under concurrent load)
            n = queries.shape[0]
            padded = 1
            while padded < n:
                padded *= 2
            if padded != n:
                queries = np.concatenate(
                    [queries, np.repeat(queries[:1], padded - n, axis=0)]
                )
            scores, ids = scan_fn(queries, kk)
            scores = np.asarray(scores)[:n]
            ids = np.asarray(ids)[:n]
            for row, p in enumerate(batch):
                p.result = (scores[row : row + 1, : p.k], ids[row : row + 1, : p.k])
        except BaseException as e:  # noqa: BLE001 — fan the failure out
            for p in batch:
                p.error = e
            raise
        finally:
            with self._lock:
                if not self._queues.get(key):
                    self._queues.pop(key, None)
                self.batches_run += 1
                self.requests_served += len(batch)
            for p in batch:
                if p is not batch[0]:
                    p.done.set()
        return batch[0].result

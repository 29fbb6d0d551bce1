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
``max_wait_s`` for followers (returning early when ``max_batch`` query rows
accumulate), then runs ONE stacked scan and distributes row slices.
Followers block on an event. Worst-case added latency is ``max_wait_s``
(default 2 ms — small against a 1M-row scan, invisible under load because
a full batch departs immediately). A submission may carry a whole [q, D]
query block (the SearchBatch RPC path) — blocks and single vectors
coalesce together. Filtered searches (per-request candidate sets) do not
batch — they take the direct path in the engine.

Pipelining: the leader holds no lock while the device scan runs, so the
next group forms behind it and its leader dispatches concurrently — under
sustained load the device pipeline stays full (group N+1's scan is queued
while group N's results are in flight back to the host).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Hashable, List, Optional, Tuple

import numpy as np


@dataclass
class _Pending:
    vectors: np.ndarray         # [q, D] — one or many query rows
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
        self._rows: Dict[Hashable, int] = {}
        # observability: how many scans were saved by coalescing
        self.batches_run = 0
        self.requests_served = 0
        self.rows_served = 0

    def run(
        self,
        key: Hashable,
        scan_fn: Callable[[np.ndarray, int], Tuple[np.ndarray, np.ndarray]],
        vectors: np.ndarray,
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Submit query rows (``[D]`` or ``[q, D]``); returns their
        ``(scores [q, k], ids [q, k])`` slice of the coalesced scan."""
        arr = np.asarray(vectors, np.float32)
        if arr.ndim == 1:
            arr = arr.reshape(1, -1)
        me = _Pending(vectors=arr, k=int(k))
        with self._lock:
            queue = self._queues.setdefault(key, [])
            queue.append(me)
            self._rows[key] = self._rows.get(key, 0) + arr.shape[0]
            leader = len(queue) == 1

        if not leader:
            me.done.wait()
            if me.error is not None:
                raise me.error
            return me.result

        # leader: give followers a short window to pile in (skip the wait
        # when this submission alone already fills the batch)
        if arr.shape[0] < self.max_batch:
            deadline = time.monotonic() + self.max_wait_s
            while True:
                with self._lock:
                    if self._rows[key] >= self.max_batch:
                        break
                now = time.monotonic()
                if now >= deadline:
                    break
                time.sleep(min(deadline - now, 0.0002))

        with self._lock:
            batch = self._queues.pop(key)
            self._queues[key] = []
            self._rows[key] = 0
            # anything enqueued after this point starts a new group
        try:
            queries = (
                batch[0].vectors if len(batch) == 1
                else np.concatenate([p.vectors for p in batch])
            )
            kk = max(p.k for p in batch)
            n = queries.shape[0]
            # run in chunks of <= max_batch rows, each padded to a power of
            # two: bounded set of scan shapes (otherwise stacked SearchBatch
            # groups produce 4096/8192-row one-off shapes, each a fresh
            # multi-minute compile behind a remote-compile relay), and every
            # distinct coalesced size would compile its own program
            # (measured as multi-second p99 spikes under concurrent load)
            out_s: List[np.ndarray] = []
            out_i: List[np.ndarray] = []
            for start in range(0, n, self.max_batch):
                chunk = queries[start:start + self.max_batch]
                c = chunk.shape[0]
                padded = 1
                while padded < c:
                    padded *= 2
                if padded != c:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[:1], padded - c, axis=0)]
                    )
                s, i = scan_fn(chunk, kk)
                out_s.append(np.asarray(s)[:c])
                out_i.append(np.asarray(i)[:c])
            scores = out_s[0] if len(out_s) == 1 else np.concatenate(out_s)
            ids = out_i[0] if len(out_i) == 1 else np.concatenate(out_i)
            row = 0
            for p in batch:
                q = p.vectors.shape[0]
                p.result = (scores[row:row + q, : p.k], ids[row:row + q, : p.k])
                row += q
        except BaseException as e:  # noqa: BLE001 — fan the failure out
            for p in batch:
                p.error = e
            raise
        finally:
            with self._lock:
                if not self._queues.get(key):
                    self._queues.pop(key, None)
                    self._rows.pop(key, None)
                self.batches_run += 1
                self.requests_served += len(batch)
                self.rows_served += sum(p.vectors.shape[0] for p in batch)
            for p in batch:
                if p is not batch[0]:
                    p.done.set()
        return batch[0].result

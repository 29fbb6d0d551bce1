"""Bitcask-style key-value store on the WAL (the core commit log).

Reference parity: ``diskv/`` — Open with directory lock + full index replay
(db.go:71-147,497+), Put/Get/Delete/Exist each wrapping a single-op Batch
(db.go:245-300), batches with ids and a batch-finish marker record
(batch.go:115-344), ordered iteration (db.go:309-469), Merge compaction
rewriting live records with a hint-style index swap (merge.go:40-330), and
Watch events (watch.go:25-119). Record format: type + batch_id + key/value
lengths + payload, CRC at the WAL chunk layer (record.go:42-130).

The in-memory index is a plain dict + lazily-sorted key list (the role of
diskv's btree); compaction rewrites live records into fresh segments and
drops the old ones.
"""

from __future__ import annotations

import fcntl
import os
import struct
import threading
from typing import Callable, Dict, Iterator, List, Optional, Tuple

from coltt_tpu.storage.wal import WAL, ChunkPosition

REC_PUT = 1
REC_DELETE = 2
REC_BATCH_FINISH = 3

_LOCK_FILE = "FLOCK"


def _encode_record(rtype: int, batch_id: int, key: bytes, value: bytes) -> bytes:
    return (
        struct.pack(">BQII", rtype, batch_id, len(key), len(value)) + key + value
    )


def _decode_record(b: bytes) -> Tuple[int, int, bytes, bytes]:
    rtype, batch_id, klen, vlen = struct.unpack(">BQII", b[:17])
    key = b[17 : 17 + klen]
    value = b[17 + klen : 17 + klen + vlen]
    return rtype, batch_id, key, value


class Batch:
    """Atomic multi-op write: records + finish marker hit the log together;
    the index is updated only after the finish marker is durable."""

    def __init__(self, db: "KV", batch_id: int):
        self._db = db
        self._id = batch_id
        self._pending: Dict[bytes, Optional[bytes]] = {}

    def put(self, key: bytes, value: bytes) -> None:
        self._pending[bytes(key)] = bytes(value)

    def delete(self, key: bytes) -> None:
        self._pending[bytes(key)] = None

    def get(self, key: bytes) -> Optional[bytes]:
        key = bytes(key)
        if key in self._pending:
            return self._pending[key]
        return self._db.get(key)

    def commit(self) -> None:
        if not self._pending:
            return
        db = self._db
        with db._mu:
            payloads = []
            keys = []
            for key, value in self._pending.items():
                if value is None:
                    payloads.append(_encode_record(REC_DELETE, self._id, key, b""))
                else:
                    payloads.append(_encode_record(REC_PUT, self._id, key, value))
                keys.append((key, value))
            payloads.append(_encode_record(REC_BATCH_FINISH, self._id, b"", b""))
            positions = db._wal.write_batch(payloads)
            for (key, value), pos in zip(keys, positions[:-1]):
                if value is None:
                    db._index.pop(key, None)
                    db._emit("delete", key, None)
                else:
                    db._index[key] = pos
                    db._emit("put", key, value)
            db._sorted_dirty = True
        self._pending = {}


class KV:
    """Single-process KV with crash-safe replay."""

    def __init__(self, directory: str, *, segment_size: int = 1 << 30,
                 sync_on_write: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._lock_f = open(os.path.join(directory, _LOCK_FILE), "w")
        try:
            fcntl.flock(self._lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            raise RuntimeError(f"data dir {directory} is locked by another process") from e
        self._wal = WAL(
            os.path.join(directory, "wal"),
            segment_size=segment_size,
            sync_on_write=sync_on_write,
        )
        self._mu = threading.RLock()
        self._index: Dict[bytes, ChunkPosition] = {}
        self._sorted_keys: List[bytes] = []
        self._sorted_dirty = True
        self._batch_seq = 0
        self._watchers: List[Callable[[str, bytes, Optional[bytes]], None]] = []
        self._replay()

    # -- startup replay (diskv loadIndexFromWAL, db.go:497) -------------------
    def _replay(self) -> None:
        staged: Dict[int, List[Tuple[int, bytes, ChunkPosition]]] = {}
        for payload, pos in self._wal.read_all():
            rtype, batch_id, key, _ = _decode_record(payload)
            if rtype == REC_BATCH_FINISH:
                for r, k, p in staged.pop(batch_id, []):
                    if r == REC_PUT:
                        self._index[k] = p
                    else:
                        self._index.pop(k, None)
                self._batch_seq = max(self._batch_seq, batch_id)
            else:
                staged.setdefault(batch_id, []).append((rtype, key, pos))
        # unfinished batches (crash mid-commit) are discarded — atomicity
        self._sorted_dirty = True

    # -- single-op API (each wraps a Batch, db.go:245-300) --------------------
    def new_batch(self) -> Batch:
        with self._mu:
            self._batch_seq += 1
            return Batch(self, self._batch_seq)

    def put(self, key: bytes, value: bytes) -> None:
        b = self.new_batch()
        b.put(key, value)
        b.commit()

    def delete(self, key: bytes) -> None:
        b = self.new_batch()
        b.delete(key)
        b.commit()

    def get(self, key: bytes) -> Optional[bytes]:
        with self._mu:
            pos = self._index.get(bytes(key))
        if pos is None:
            return None
        payload = self._wal.read(pos)
        _, _, _, value = _decode_record(payload)
        return value

    def exists(self, key: bytes) -> bool:
        with self._mu:
            return bytes(key) in self._index

    def __len__(self) -> int:
        with self._mu:
            return len(self._index)

    # -- ordered iteration (db.go:309-469) -------------------------------------
    def _keys_sorted(self) -> List[bytes]:
        with self._mu:
            if self._sorted_dirty:
                self._sorted_keys = sorted(self._index)
                self._sorted_dirty = False
            return list(self._sorted_keys)

    def ascend(self, *, start: Optional[bytes] = None, end: Optional[bytes] = None
               ) -> Iterator[Tuple[bytes, bytes]]:
        for k in self._keys_sorted():
            if start is not None and k < start:
                continue
            if end is not None and k > end:
                break
            v = self.get(k)
            if v is not None:
                yield k, v

    def descend(self) -> Iterator[Tuple[bytes, bytes]]:
        for k in reversed(self._keys_sorted()):
            v = self.get(k)
            if v is not None:
                yield k, v

    def keys(self, prefix: bytes = b"") -> List[bytes]:
        return [k for k in self._keys_sorted() if k.startswith(prefix)]

    # -- watch (watch.go) -------------------------------------------------------
    def watch(self, fn: Callable[[str, bytes, Optional[bytes]], None]) -> None:
        self._watchers.append(fn)

    def _emit(self, event: str, key: bytes, value: Optional[bytes]) -> None:
        for fn in self._watchers:
            try:
                fn(event, key, value)
            except Exception:
                pass

    # -- compaction (diskv merge.go) ---------------------------------------------
    def merge(self) -> None:
        """Rewrite live records into fresh segments, drop the old ones."""
        with self._mu:
            old_segments = self._wal.segments()
            live = [(k, self.get(k)) for k in self._keys_sorted()]
            self._wal._rotate()
            boundary = self._wal._active_id
            new_index: Dict[bytes, ChunkPosition] = {}
            if live:
                self._batch_seq += 1
                bid = self._batch_seq
                payloads = [
                    _encode_record(REC_PUT, bid, k, v) for k, v in live if v is not None
                ]
                payloads.append(_encode_record(REC_BATCH_FINISH, bid, b"", b""))
                positions = self._wal.write_batch(payloads)
                for (k, _), pos in zip(live, positions[:-1]):
                    new_index[k] = pos
            self._index = new_index
            self._sorted_dirty = True
            self._wal.remove_segments([s for s in old_segments if s < boundary])

    def sync(self) -> None:
        self._wal.sync()

    def close(self) -> None:
        self._wal.close()
        fcntl.flock(self._lock_f, fcntl.LOCK_UN)
        self._lock_f.close()

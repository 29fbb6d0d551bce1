"""Bitcask-style key-value store on the WAL (the core commit log).

Reference parity: ``diskv/`` — Open with directory lock + full index replay
(db.go:71-147,497+), Put/Get/Delete/Exist each wrapping a single-op Batch
(db.go:245-300), batches with ids and a batch-finish marker record
(batch.go:115-344), ordered iteration (db.go:309-469), Merge compaction
rewriting live records with a hint-style index swap (merge.go:40-330), and
Watch events (watch.go:25-119). Record format: type + batch_id + expire +
key/value lengths + payload, CRC at the WAL chunk layer (record.go:42-130);
record expiry (record.go:52-57, checked on read db.go:470-495 and dropped
by merge merge.go:138) is honored via per-key TTLs.

The in-memory index is a plain dict + lazily-sorted key list (the role of
diskv's btree); compaction rewrites live records into fresh segments and
drops the old ones.
"""

from __future__ import annotations

import fcntl
import os
import struct
import threading
import time
from typing import Callable, Dict, Iterator, List, NamedTuple, Optional, Tuple

from coltt_tpu.storage.wal import WAL, ChunkPosition

REC_PUT = 1
REC_DELETE = 2
REC_BATCH_FINISH = 3

_LOCK_FILE = "FLOCK"
_FORMAT_FILE = "FORMAT"
_FORMAT = "2"  # record header v2 (adds the expire stamp)

_HDR = struct.Struct(">BQqII")  # type, batch_id, expire (unix ns, 0=never)


def _encode_record(rtype: int, batch_id: int, key: bytes, value: bytes,
                   expire: int = 0) -> bytes:
    return _HDR.pack(rtype, batch_id, expire, len(key), len(value)) + key + value


def _decode_record(b: bytes) -> Tuple[int, int, bytes, bytes, int]:
    rtype, batch_id, expire, klen, vlen = _HDR.unpack(b[: _HDR.size])
    key = b[_HDR.size : _HDR.size + klen]
    value = b[_HDR.size + klen : _HDR.size + klen + vlen]
    return rtype, batch_id, key, value, expire


class _Entry(NamedTuple):
    pos: ChunkPosition
    expire: int  # unix ns; 0 = never

    def live(self, now: Optional[int] = None) -> bool:
        return self.expire == 0 or self.expire > (now or time.time_ns())


class Batch:
    """Atomic multi-op write: records + finish marker hit the log together;
    the index is updated only after the finish marker is durable."""

    def __init__(self, db: "KV", batch_id: int):
        self._db = db
        self._id = batch_id
        self._pending: Dict[bytes, Tuple[Optional[bytes], int]] = {}

    def put(self, key: bytes, value: bytes, *, ttl: Optional[float] = None) -> None:
        expire = time.time_ns() + int(ttl * 1e9) if ttl is not None else 0
        self._pending[bytes(key)] = (bytes(value), expire)

    def delete(self, key: bytes) -> None:
        self._pending[bytes(key)] = (None, 0)

    def get(self, key: bytes) -> Optional[bytes]:
        key = bytes(key)
        if key in self._pending:
            value, expire = self._pending[key]
            if expire and expire <= time.time_ns():
                return None
            return value
        return self._db.get(key)

    def rollback(self) -> None:
        """Discard pending writes (batch.go:345 — nothing hit the log yet)."""
        self._pending = {}

    def commit(self) -> None:
        if not self._pending:
            return
        db = self._db
        with db._mu:
            payloads = []
            keys = []
            for key, (value, expire) in self._pending.items():
                if value is None:
                    payloads.append(_encode_record(REC_DELETE, self._id, key, b""))
                else:
                    payloads.append(
                        _encode_record(REC_PUT, self._id, key, value, expire)
                    )
                keys.append((key, value, expire))
            payloads.append(_encode_record(REC_BATCH_FINISH, self._id, b"", b""))
            positions = db._wal.write_batch(payloads)
            for (key, value, expire), pos in zip(keys, positions[:-1]):
                if value is None:
                    db._index.pop(key, None)
                    db._emit("delete", key, None)
                else:
                    db._index[key] = _Entry(pos, expire)
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
        try:
            # record-format guard: decoding a v1 (pre-expire, 17-byte header)
            # log with the v2 layout would corrupt the index silently
            fmt_path = os.path.join(directory, _FORMAT_FILE)
            wal_dir = os.path.join(directory, "wal")
            has_data = os.path.isdir(wal_dir) and any(os.scandir(wal_dir))
            if os.path.exists(fmt_path):
                with open(fmt_path) as f:
                    found = f.read().strip()
                if found != _FORMAT:
                    raise RuntimeError(
                        f"KV dir {directory} uses record format {found!r}; "
                        f"this build reads format {_FORMAT!r}"
                    )
            elif has_data:
                raise RuntimeError(
                    f"KV dir {directory} predates the record-format marker "
                    "(v1 headers); it cannot be read by this build"
                )
            else:
                with open(fmt_path, "w") as f:
                    f.write(_FORMAT)
            self._wal = WAL(
                wal_dir,
                segment_size=segment_size,
                sync_on_write=sync_on_write,
            )
            self._mu = threading.RLock()
            self._index: Dict[bytes, _Entry] = {}
            self._sorted_keys: List[bytes] = []
            self._sorted_dirty = True
            self._batch_seq = 0
            self._watchers: List[Callable[[str, bytes, Optional[bytes]], None]] = []
            self._replay()
        except BaseException:
            # a failed open must not keep the directory flock'd — a caller
            # catching the error and retrying (or a non-refcounting runtime)
            # would otherwise deadlock against our own stale lock
            fcntl.flock(self._lock_f, fcntl.LOCK_UN)
            self._lock_f.close()
            raise

    # -- startup replay (diskv loadIndexFromWAL, db.go:497) -------------------
    def _replay(self) -> None:
        now = time.time_ns()
        staged: Dict[int, List[Tuple[int, bytes, ChunkPosition, int]]] = {}
        for payload, pos in self._wal.read_all():
            rtype, batch_id, key, _, expire = _decode_record(payload)
            if rtype == REC_BATCH_FINISH:
                for r, k, p, e in staged.pop(batch_id, []):
                    if r == REC_PUT and (e == 0 or e > now):
                        self._index[k] = _Entry(p, e)
                    else:
                        self._index.pop(k, None)
                self._batch_seq = max(self._batch_seq, batch_id)
            else:
                staged.setdefault(batch_id, []).append((rtype, key, pos, expire))
        # unfinished batches (crash mid-commit) are discarded — atomicity
        self._sorted_dirty = True

    # -- single-op API (each wraps a Batch, db.go:245-300) --------------------
    def new_batch(self) -> Batch:
        with self._mu:
            self._batch_seq += 1
            return Batch(self, self._batch_seq)

    def put(self, key: bytes, value: bytes, *, ttl: Optional[float] = None) -> None:
        b = self.new_batch()
        b.put(key, value, ttl=ttl)
        b.commit()

    def delete(self, key: bytes) -> None:
        b = self.new_batch()
        b.delete(key)
        b.commit()

    def get(self, key: bytes) -> Optional[bytes]:
        with self._mu:
            ent = self._index.get(bytes(key))
        if ent is None or not ent.live():
            return None
        payload = self._wal.read(ent.pos)
        _, _, _, value, _ = _decode_record(payload)
        return value

    def ttl(self, key: bytes) -> Optional[float]:
        """Seconds until expiry; None if missing/expired; inf if no TTL."""
        with self._mu:
            ent = self._index.get(bytes(key))
        if ent is None or not ent.live():
            return None
        if ent.expire == 0:
            return float("inf")
        return (ent.expire - time.time_ns()) / 1e9

    def exists(self, key: bytes) -> bool:
        with self._mu:
            ent = self._index.get(bytes(key))
        return ent is not None and ent.live()

    def __len__(self) -> int:
        now = time.time_ns()
        with self._mu:
            return sum(1 for e in self._index.values() if e.live(now))

    def stat(self) -> Dict[str, int]:
        """Live key count + on-disk bytes (db.go:230 Stat)."""
        disk = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(self.directory)
            for f in files
        )
        return {"keys": len(self), "disk_size": disk,
                "segments": len(self._wal.segments())}

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

    def keys(self, prefix: bytes = b"", *, filter_expired: bool = True
             ) -> List[bytes]:
        ks = [k for k in self._keys_sorted() if k.startswith(prefix)]
        if filter_expired:
            now = time.time_ns()
            with self._mu:
                ks = [k for k in ks
                      if k in self._index and self._index[k].live(now)]
        return ks

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
            # expired records are dropped here (merge.go:138); live TTLs are
            # carried through the rewrite
            live = [
                (k, self.get(k), self._index[k].expire)
                for k in self._keys_sorted()
                if self._index[k].live()
            ]
            live = [(k, v, e) for k, v, e in live if v is not None]
            self._wal._rotate()
            boundary = self._wal._active_id
            new_index: Dict[bytes, _Entry] = {}
            if live:
                self._batch_seq += 1
                bid = self._batch_seq
                payloads = [
                    _encode_record(REC_PUT, bid, k, v, e) for k, v, e in live
                ]
                payloads.append(_encode_record(REC_BATCH_FINISH, bid, b"", b""))
                positions = self._wal.write_batch(payloads)
                for (k, _, e), pos in zip(live, positions[:-1]):
                    new_index[k] = _Entry(pos, e)
            self._index = new_index
            self._sorted_dirty = True
            self._wal.remove_segments([s for s in old_segments if s < boundary])

    def sync(self) -> None:
        self._wal.sync()

    def close(self) -> None:
        self._wal.close()
        fcntl.flock(self._lock_f, fcntl.LOCK_UN)
        self._lock_f.close()

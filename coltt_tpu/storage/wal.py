"""Segmented append-only write-ahead log.

Reference parity: ``pkg/wal`` — 32 KB blocks, 7-byte chunk headers
(CRC32 + length + type), chunk types FULL/FIRST/MIDDLE/LAST for payloads
spanning blocks (segment.go:47-60), segment rotation at SegmentSize,
pending-writes batch API, positional reads by
``ChunkPosition{SegmentId, BlockNumber, ChunkOffset, ChunkSize}``
(segment.go:96-110), full-log readers (wal.go:190-296).

Same on-disk geometry, implemented host-side in Python (zlib.crc32 is C).
The WAL backs the KV commit log that makes TPU-side mutations crash-safe:
a write is acknowledged only after it is in the log, so un-checkpointed
device state can always be replayed.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

BLOCK_SIZE = 32 * 1024
CHUNK_HEADER_SIZE = 7  # crc32(4) + length(2) + type(1)

CHUNK_FULL = 0
CHUNK_FIRST = 1
CHUNK_MIDDLE = 2
CHUNK_LAST = 3

_SEG_EXT = ".seg"


class CorruptLogError(Exception):
    pass


@dataclass(frozen=True)
class ChunkPosition:
    segment_id: int
    block_number: int
    chunk_offset: int
    chunk_size: int  # total bytes on disk incl. headers, all fragments

    def pack(self) -> bytes:
        return struct.pack(
            ">IIII", self.segment_id, self.block_number, self.chunk_offset,
            self.chunk_size,
        )

    @classmethod
    def unpack(cls, b: bytes) -> "ChunkPosition":
        return cls(*struct.unpack(">IIII", b[:16]))


def _segment_path(directory: str, seg_id: int) -> str:
    return os.path.join(directory, f"{seg_id:010d}{_SEG_EXT}")


class WAL:
    """One writer, many positional readers."""

    def __init__(
        self,
        directory: str,
        *,
        segment_size: int = 1 << 30,
        sync_on_write: bool = False,
    ):
        self.directory = directory
        self.segment_size = segment_size
        self.sync_on_write = sync_on_write
        os.makedirs(directory, exist_ok=True)

        seg_ids = sorted(
            int(fn[: -len(_SEG_EXT)])
            for fn in os.listdir(directory)
            if fn.endswith(_SEG_EXT)
        )
        self._segment_ids: List[int] = seg_ids or [0]
        self._active_id = self._segment_ids[-1]
        path = _segment_path(directory, self._active_id)
        self._active = open(path, "ab+")
        self._active.seek(0, os.SEEK_END)
        self._write_off = self._active.tell()

    # -- write ---------------------------------------------------------------
    def _rotate(self) -> None:
        self._active.flush()
        os.fsync(self._active.fileno())
        self._active.close()
        self._active_id += 1
        self._segment_ids.append(self._active_id)
        self._active = open(_segment_path(self.directory, self._active_id), "ab+")
        self._write_off = 0

    def write(self, data: bytes) -> ChunkPosition:
        return self.write_batch([data])[0]

    def write_batch(self, datas: List[bytes]) -> List[ChunkPosition]:
        """Append all payloads, rotating segments as needed; single flush."""
        positions = []
        buf = bytearray()
        base_off = self._write_off

        def emit(payload: bytes):
            nonlocal base_off
            # rotate if even a FULL header can't start cleanly in this segment
            est = len(payload) + CHUNK_HEADER_SIZE * (
                2 + len(payload) // (BLOCK_SIZE - CHUNK_HEADER_SIZE)
            )
            if base_off + len(buf) + est > self.segment_size and (base_off + len(buf)) > 0:
                self._flush_buf(buf)
                self._rotate()
                base_off = 0

            off = base_off + len(buf)
            start_block = off // BLOCK_SIZE
            start_off = off % BLOCK_SIZE

            remaining = payload
            first = True
            while True:
                cur_off = (base_off + len(buf)) % BLOCK_SIZE
                room = BLOCK_SIZE - cur_off
                if room < CHUNK_HEADER_SIZE:
                    buf.extend(b"\x00" * room)  # pad to block boundary
                    continue
                space = room - CHUNK_HEADER_SIZE
                frag = remaining[:space]
                remaining = remaining[len(frag):]
                if first and not remaining:
                    ctype = CHUNK_FULL
                elif first:
                    ctype = CHUNK_FIRST
                elif remaining:
                    ctype = CHUNK_MIDDLE
                else:
                    ctype = CHUNK_LAST
                header = struct.pack(">IHB", zlib.crc32(frag), len(frag), ctype)
                buf.extend(header)
                buf.extend(frag)
                first = False
                if not remaining:
                    break
            total = (base_off + len(buf)) - off
            positions.append(
                ChunkPosition(self._active_id, start_block, start_off, total)
            )

        for d in datas:
            emit(d)
        self._flush_buf(buf)
        return positions

    def _flush_buf(self, buf: bytearray) -> None:
        if buf:
            self._active.write(buf)
            self._active.flush()
            if self.sync_on_write:
                os.fsync(self._active.fileno())
            self._write_off = self._active.tell()
            buf.clear()

    def sync(self) -> None:
        self._active.flush()
        os.fsync(self._active.fileno())

    def close(self) -> None:
        self.sync()
        self._active.close()

    # -- read ------------------------------------------------------------------
    def read(self, pos: ChunkPosition) -> bytes:
        path = _segment_path(self.directory, pos.segment_id)
        with open(path, "rb") as f:
            f.seek(pos.block_number * BLOCK_SIZE + pos.chunk_offset)
            raw = f.read(pos.chunk_size)
        return self._decode_chunks(raw, pos)

    @staticmethod
    def _decode_chunks(raw: bytes, pos) -> bytes:
        out = bytearray()
        i = 0
        abs_off = pos.block_number * BLOCK_SIZE + pos.chunk_offset
        while i < len(raw):
            cur = (abs_off + i) % BLOCK_SIZE
            room = BLOCK_SIZE - cur
            if room < CHUNK_HEADER_SIZE:
                i += room  # block padding
                continue
            crc, length, ctype = struct.unpack(">IHB", raw[i : i + CHUNK_HEADER_SIZE])
            frag = raw[i + CHUNK_HEADER_SIZE : i + CHUNK_HEADER_SIZE + length]
            if zlib.crc32(frag) != crc:
                raise CorruptLogError(f"crc mismatch at {pos}")
            out.extend(frag)
            i += CHUNK_HEADER_SIZE + length
            if ctype in (CHUNK_FULL, CHUNK_LAST):
                break
        return bytes(out)

    def read_all(self) -> Iterator[Tuple[bytes, ChunkPosition]]:
        """Replay every payload in log order (index rebuild path)."""
        for seg_id in self._segment_ids:
            path = _segment_path(self.directory, seg_id)
            if not os.path.exists(path):
                continue
            with open(path, "rb") as f:
                data = f.read()
            i = 0
            pending = bytearray()
            start: Optional[Tuple[int, int]] = None
            while i + CHUNK_HEADER_SIZE <= len(data):
                cur = i % BLOCK_SIZE
                room = BLOCK_SIZE - cur
                if room < CHUNK_HEADER_SIZE:
                    i += room
                    continue
                crc, length, ctype = struct.unpack(
                    ">IHB", data[i : i + CHUNK_HEADER_SIZE]
                )
                if crc == 0 and length == 0 and ctype == 0:
                    # zero padding / preallocated tail — skip to next block
                    i += room
                    continue
                frag = data[i + CHUNK_HEADER_SIZE : i + CHUNK_HEADER_SIZE + length]
                if len(frag) < length or zlib.crc32(frag) != crc:
                    # torn tail write — stop replay of this segment
                    break
                if ctype in (CHUNK_FULL, CHUNK_FIRST):
                    pending = bytearray(frag)
                    start = (i // BLOCK_SIZE, i % BLOCK_SIZE)
                else:
                    pending.extend(frag)
                i += CHUNK_HEADER_SIZE + length
                if ctype in (CHUNK_FULL, CHUNK_LAST) and start is not None:
                    pos = ChunkPosition(
                        seg_id, start[0], start[1],
                        i - (start[0] * BLOCK_SIZE + start[1]),
                    )
                    yield bytes(pending), pos
                    pending = bytearray()
                    start = None

    # -- maintenance -------------------------------------------------------------
    def segments(self) -> List[int]:
        return list(self._segment_ids)

    def remove_segments(self, seg_ids: List[int]) -> None:
        """Drop obsolete segments after compaction (diskv merge swap)."""
        for sid in seg_ids:
            if sid == self._active_id:
                continue
            try:
                os.remove(_segment_path(self.directory, sid))
            except FileNotFoundError:
                pass
            if sid in self._segment_ids:
                self._segment_ids.remove(sid)

"""Native IO library (native/colttio.cpp) — parity with the Python WAL.

The two implementations must be bit-identical on disk: a log written by
either must replay identically through both (the reference's WAL format
contract, pkg/wal/segment.go:47-60).
"""

import os
import zlib

import numpy as np
import pytest

from coltt_tpu import native
from coltt_tpu.storage import wal as walmod
from coltt_tpu.storage.wal import WAL, BLOCK_SIZE, ChunkPosition

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_crc32_matches_zlib(rng):
    for n in (0, 1, 7, 100, 70_000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32(data) == zlib.crc32(data)


def _payloads(rng):
    return [
        b"x",
        b"hello world" * 3,
        rng.integers(0, 256, BLOCK_SIZE - 7, dtype=np.uint8).tobytes(),  # exact block
        rng.integers(0, 256, BLOCK_SIZE * 3 + 17, dtype=np.uint8).tobytes(),  # spans
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
    ]


def test_frame_matches_python(tmp_path, rng, monkeypatch):
    """Native-framed and Python-framed segments are byte-identical."""
    payloads = _payloads(rng)

    w1 = WAL(str(tmp_path / "nat"))
    pos1 = w1.write_batch(payloads)
    w1.close()

    monkeypatch.setattr(native, "available", lambda: False)
    w2 = WAL(str(tmp_path / "py"))
    pos2 = w2.write_batch(payloads)
    w2.close()

    assert pos1 == pos2
    b1 = open(tmp_path / "nat" / "0000000000.seg", "rb").read()
    b2 = open(tmp_path / "py" / "0000000000.seg", "rb").read()
    assert b1 == b2


def test_cross_replay(tmp_path, rng, monkeypatch):
    """Python-written log replays through the native scanner and back."""
    payloads = _payloads(rng)
    monkeypatch.setattr(native, "available", lambda: False)
    w = WAL(str(tmp_path / "log"))
    want_pos = w.write_batch(payloads)
    w.close()
    monkeypatch.undo()

    assert native.available()
    w = WAL(str(tmp_path / "log"))
    got = list(w.read_all())
    assert [p for p, _ in got] == payloads
    assert [pos for _, pos in got] == want_pos
    # positional reads via native decode
    for payload, pos in zip(payloads, want_pos):
        assert w.read(pos) == payload
    w.close()


def test_native_scan_stops_at_torn_tail(tmp_path, rng):
    w = WAL(str(tmp_path / "log"))
    w.write_batch([b"alpha", b"beta" * 1000])
    w.close()
    path = tmp_path / "log" / "0000000000.seg"
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-10])  # tear the tail
    w = WAL(str(tmp_path / "log"))
    got = [p for p, _ in w.read_all()]
    assert got == [b"alpha"]
    w.close()


def test_wal_frame_block_boundary_padding(rng):
    # start 3 bytes before a block boundary: header can't fit, must pad
    off = BLOCK_SIZE - 3
    framed = native.wal_frame(b"abc", off)
    assert framed[:3] == b"\x00\x00\x00"
    assert native.wal_decode(framed, off) == b"abc"

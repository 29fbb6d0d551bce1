"""Storage layer (L0).

Host-side durability, mirroring the reference's storage stack
(SURVEY.md §2.6): a segmented CRC-checked WAL (``pkg/wal``), a
bitcask-style KV built on it (``diskv/``) used as the core commit log, and
an object store with versioning (``pkg/minio``) holding the three-object
collection checkpoints for edge/experimental.
"""

from coltt_tpu.storage.wal import WAL, ChunkPosition
from coltt_tpu.storage.kv import KV
from coltt_tpu.storage.objectstore import LocalObjectStore

__all__ = ["WAL", "ChunkPosition", "KV", "LocalObjectStore"]

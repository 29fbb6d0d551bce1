"""Metadata index layer.

Host-side counterpart of the reference's roaring-bitmap inverted indexes
(``pkg/inverted`` — the edge/experimental filter index — and ``pkg/index``,
the legacy string-normalized variant used by core; SURVEY.md §2.5). Filter
evaluation stays on the host CPU, producing candidate id bitmaps that gate a
device-side gathered or masked scan (SURVEY.md §7 phase 3).
"""

from coltt_tpu.index.schema import CollectionSchema, FieldSchema, FieldType
from coltt_tpu.index.filter import Filter, CompositeFilter, Op, LogicalOp, FilterExpression
from coltt_tpu.index.bitmap import Bitset, InvertedIndex

__all__ = [
    "CollectionSchema",
    "FieldSchema",
    "FieldType",
    "Filter",
    "CompositeFilter",
    "Op",
    "LogicalOp",
    "FilterExpression",
    "Bitset",
    "InvertedIndex",
]

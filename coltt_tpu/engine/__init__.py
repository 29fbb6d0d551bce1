"""Engine layer (L3).

The three engines of the reference, one per ``-mode`` (SURVEY.md table at
top): ``core`` (HNSW + commit-log KV), ``edge`` (quantized FLAT + object
store), ``experimental`` (CFLAT multi-vector + object store). Engines own
collection lifecycle, schema/state management, mutation with rollback, and
search orchestration; the device kernels live in ops/ and store/.
"""

from coltt_tpu.engine.errors import EngineError, ErrorCode
from coltt_tpu.engine.state import CollectionStateManager
from coltt_tpu.engine.edge import EdgeEngine
from coltt_tpu.engine.core import CoreEngine
from coltt_tpu.engine.experimental import ExperimentalEngine

__all__ = [
    "EngineError",
    "ErrorCode",
    "CollectionStateManager",
    "EdgeEngine",
    "CoreEngine",
    "ExperimentalEngine",
]

"""Device mesh construction + sharding specs.

The corpus ("shard") axis plays the role of the reference's 16 in-process
shards (edge/constants.go EDGE_MAP_SHARD_COUNT); the optional query
("batch") axis is data parallelism over concurrent queries — the real
version of the replica load-balancer the reference left empty
(loadbalancer/, SURVEY.md layer map note).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"
BATCH_AXIS = "batch"


def make_mesh(
    num_shards: Optional[int] = None,
    *,
    batch: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1D corpus mesh by default; 2D (shard, batch) when batch > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if num_shards is None:
        num_shards = len(devices) // batch
    need = num_shards * batch
    if need > len(devices):
        raise ValueError(
            f"need {need} devices (shards={num_shards} x batch={batch}), "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(num_shards, batch)
    return Mesh(grid, (SHARD_AXIS, BATCH_AXIS))


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the corpus axis (first array dim)."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh) -> NamedSharding:
    """Query batches sharded over the batch axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))

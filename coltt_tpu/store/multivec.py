"""CFLAT weighted multi-vector store.

Reference parity: ``experimental/multi_vector_vertex.go`` — records carry
multiple *named* vectors (schema declares Vector-typed fields,
IndexType_Vector=4); search takes ``[]MultiVectorIndex{index_name, vector,
include_or_not, ratio}`` and scores each record as

    score = sum_q scoreHelper(dist(node.vec[q], query.vec[q])) * ratio_q/100

over the included query vectors (multi_vector_vertex.go:85-138), always
shard-parallel with local PQs.

TPU-native design: one dense ``[capacity, D_f]`` code array per vector
field sharing a single slot axis + validity mask (so a record is one slot
across all fields). A CFLAT search is F fused scans — one matmul per
included field — whose normalized scores are weighted-summed elementwise
before a single top-k. The goroutine fan-out becomes MXU batching.
"""

from __future__ import annotations

import io
import threading
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

from coltt_tpu.ops.distance import Metric, scan_distances
from coltt_tpu.ops.quant import Quantization, dequantize, quantize, storage_dtype
from coltt_tpu.ops.score import normalize_score
from coltt_tpu.store.flat import _pad_pow2, _round_capacity

_SNAPSHOT_MAGIC = b"CTTMVEC1"


@partial(jax.jit, static_argnames=("k", "metric", "compute_dtype"))
def _cflat_topk(field_state, queries, ratios, valid, *, k, metric, compute_dtype):
    """Weighted-sum-of-normalized-scores over F fields, then one top-k.

    field_state: tuple of (codes [N,Df], scale [N,1], sqnorm [N]) per field;
    queries: tuple of [Df] f32; ratios: tuple of scalar f32 (already /100).
    """
    vals, idx = _cflat_topk_batch(
        field_state, tuple(q[None, :] for q in queries), ratios, valid,
        k=k, metric=metric, compute_dtype=compute_dtype,
    )
    return vals[0], idx[0]


@partial(jax.jit, static_argnames=("k", "metric", "compute_dtype"))
def _cflat_topk_batch(field_state, queries, ratios, valid, *, k, metric,
                      compute_dtype):
    """Batch-native CFLAT: queries is a tuple of [Q, Df] blocks (parallel to
    field_state). One matmul per field scores all Q queries against all rows;
    the weighted sum and a single top-k finish. Returns ([Q, k], [Q, k]).

    The per-field scans are the same MXU contraction the single-query path
    uses — batching queries is where the MXU utilization comes from, exactly
    as in the FLAT serving path (SearchBatch; VERDICT r2 item 6)."""
    total = None
    for (codes, scale, sqnorm), q, r in zip(field_state, queries, ratios):
        dist = scan_distances(
            q, codes, scale, sqnorm, None,
            metric=metric, compute_dtype=compute_dtype,
        )  # [Q, N]
        contrib = normalize_score(dist, metric) * r
        total = contrib if total is None else total + contrib
    total = jnp.where(valid.reshape(1, -1), total, -jnp.inf)
    vals, idx = jax.lax.top_k(total, k)
    return vals, idx.astype(jnp.int32)


def _locked(fn):
    """Serialize a MultiVectorStore method under the store lock — the
    experimental engine releases its lock before scanning (the same
    hazard as FlatStore: concurrent search/sync/upsert share the staging
    dict and swap per-field device arrays; see store/flat.py _locked)."""
    def wrapper(self, *a, **kw):
        with self._mu:
            return fn(self, *a, **kw)
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


class MultiVectorStore:
    """Multi-field vector store keyed by string primary key."""

    def __init__(
        self,
        fields: Dict[str, int],  # field name -> dim
        *,
        metric: Metric = Metric.COSINE,
        quantization: Quantization = Quantization.NONE,
        base_capacity: int = 8192,
        sharding: Optional[jax.sharding.Sharding] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        if not fields:
            raise ValueError("multi-vector store needs at least one vector field")
        self.fields = dict(fields)
        self.metric = Metric.parse(metric)
        self.quantization = Quantization.parse(quantization)
        self._qdtype = storage_dtype(self.quantization)
        self.compute_dtype = (
            jnp.float32 if self.quantization == Quantization.NONE else jnp.bfloat16
        )
        # mesh > 1 device: per-field rows live sharded P(shard) and CFLAT
        # scans route through sharded_cflat_topk (parallel/dist_search.py)
        # — the experimental engine's multi-device serving (VERDICT r4 #1;
        # reference analog: multi_vector_vertex.go:108-136 goroutines)
        self.mesh = mesh
        if sharding is None and mesh is not None and mesh.size > 1:
            from coltt_tpu.parallel.mesh import shard_spec
            sharding = shard_spec(mesh)
        self.sharding = sharding

        self.capacity = _round_capacity(base_capacity)
        self.codes: Dict[str, jax.Array] = {}
        self.scale: Dict[str, jax.Array] = {}
        self.sqnorm: Dict[str, jax.Array] = {}
        for name, dim in self.fields.items():
            self.codes[name] = self._put(jnp.zeros((self.capacity, dim), self._qdtype))
            self.scale[name] = self._put(jnp.ones((self.capacity, 1), jnp.float32))
            self.sqnorm[name] = self._put(jnp.zeros((self.capacity,), jnp.float32))
        self.valid = self._put(jnp.zeros((self.capacity,), jnp.bool_))

        self.pk_to_slot: Dict[str, int] = {}
        self.slot_to_pk: Dict[int, str] = {}
        self._free: List[int] = []
        self._next_slot = 0
        self._mu = threading.RLock()
        self._pending: Dict[int, Optional[Dict[str, np.ndarray]]] = {}

    def _put(self, x):
        return jax.device_put(x, self.sharding) if self.sharding is not None else x

    # -- mutation ----------------------------------------------------------
    def _grow(self, need: int) -> None:
        new_cap = _round_capacity(need)
        pad = new_cap - self.capacity
        for name, dim in self.fields.items():
            self.codes[name] = self._put(
                jnp.concatenate([self.codes[name], jnp.zeros((pad, dim), self._qdtype)])
            )
            self.scale[name] = self._put(
                jnp.concatenate([self.scale[name], jnp.ones((pad, 1), jnp.float32)])
            )
            self.sqnorm[name] = self._put(
                jnp.concatenate([self.sqnorm[name], jnp.zeros((pad,), jnp.float32)])
            )
        self.valid = self._put(
            jnp.concatenate([self.valid, jnp.zeros((pad,), jnp.bool_)])
        )
        self.capacity = new_cap

    @_locked
    def upsert(self, pk: str, vectors: Dict[str, np.ndarray]) -> int:
        missing = set(self.fields) - set(vectors)
        if missing:
            raise ValueError(f"record {pk!r} missing vector fields {sorted(missing)}")
        extra = set(vectors) - set(self.fields)
        if extra:
            raise ValueError(f"record {pk!r} has unknown vector fields {sorted(extra)}")
        clean = {}
        for name, vec in vectors.items():
            vec = np.asarray(vec, np.float32).reshape(-1)
            if vec.shape[0] != self.fields[name]:
                raise ValueError(
                    f"field {name!r}: dim {vec.shape[0]} != schema {self.fields[name]}"
                )
            clean[name] = vec
        slot = self.pk_to_slot.get(pk)
        if slot is None:
            if self._free:
                slot = self._free.pop()
            else:
                slot = self._next_slot
                self._next_slot += 1
                if self._next_slot > self.capacity:
                    self._grow(self._next_slot)
            self.pk_to_slot[pk] = slot
            self.slot_to_pk[slot] = pk
        self._pending[slot] = clean
        return slot

    @_locked
    def delete(self, pk: str) -> Optional[int]:
        slot = self.pk_to_slot.pop(pk, None)
        if slot is None:
            return None
        self.slot_to_pk.pop(slot, None)
        self._pending[slot] = None
        self._free.append(slot)
        return slot

    @_locked
    def sync(self) -> None:
        if not self._pending:
            return
        items = sorted(self._pending.items())
        self._pending = {}
        slots = np.array([s for s, _ in items], np.int32)
        alive = np.array([v is not None for _, v in items], bool)
        n = len(slots)
        padded = _pad_pow2(n)
        if padded != n:
            slots = np.concatenate([slots, np.full(padded - n, slots[0], np.int32)])
            alive = np.concatenate([alive, np.full(padded - n, alive[0])])
        j_slots = jnp.asarray(slots)

        for name, dim in self.fields.items():
            rows = np.stack(
                [
                    np.zeros(dim, np.float32) if v is None else v[name]
                    for _, v in items
                ]
            )
            if padded != n:
                rows = np.concatenate([rows, np.repeat(rows[:1], padded - n, axis=0)])
            u_codes, u_scale = quantize(jnp.asarray(rows), self.quantization)
            u_codes = u_codes.astype(self._qdtype)
            deq = dequantize(u_codes, u_scale)
            self.codes[name] = self.codes[name].at[j_slots].set(u_codes)
            self.scale[name] = self.scale[name].at[j_slots].set(u_scale)
            self.sqnorm[name] = self.sqnorm[name].at[j_slots].set(
                jnp.sum(deq * deq, axis=1)
            )
        self.valid = self.valid.at[j_slots].set(jnp.asarray(alive))

    # -- search ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.pk_to_slot)

    @property
    def memory_bytes(self) -> int:
        item = jnp.dtype(self._qdtype).itemsize
        per_row = sum(d * item + 8 for d in self.fields.values()) + 1
        return self.capacity * per_row

    @_locked
    def search(
        self,
        query_fields: Sequence[Tuple[str, np.ndarray, float]],
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """CFLAT search: ``query_fields`` is [(field, vector, ratio)] for the
        *included* fields (include_or_not=false entries are simply omitted —
        matching the reference, which treats them as nil internally).
        Ratios are percentages; 100 total keeps scores on the 0-100 scale.
        Returns (scores [k], slots [k])."""
        if not query_fields:
            raise ValueError("at least one included query vector required")
        self.sync()
        names, queries, ratios = [], [], []
        for name, vec, ratio in query_fields:
            if name not in self.fields:
                raise ValueError(f"unknown vector field {name!r}")
            vec = np.asarray(vec, np.float32).reshape(-1)
            if vec.shape[0] != self.fields[name]:
                raise ValueError(
                    f"field {name!r}: query dim {vec.shape[0]} != {self.fields[name]}"
                )
            names.append(name)
            queries.append(jnp.asarray(vec))
            ratios.append(jnp.float32(float(ratio) / 100.0))

        field_state = tuple(
            (self.codes[n], self.scale[n], self.sqnorm[n]) for n in names
        )
        kk = min(max(1, int(k)), self.capacity)
        if self.mesh is not None and self.mesh.size > 1:
            vals, idx = self._sharded_cflat(
                field_state, tuple(q[None, :] for q in queries),
                tuple(ratios), kk,
            )
            vals, idx = vals[0], idx[0]
        else:
            vals, idx = _cflat_topk(
                field_state, tuple(queries), tuple(ratios), self.valid,
                k=kk, metric=self.metric, compute_dtype=self.compute_dtype,
            )
            vals, idx = np.asarray(vals), np.asarray(idx)
        idx = np.where(np.isneginf(vals), -1, idx)
        return vals, idx

    def _sharded_cflat(self, field_state, queries, ratios, kk):
        """Shard-local weighted scans + collective merge (the mesh path)."""
        from coltt_tpu.parallel.dist_search import sharded_cflat_topk
        from coltt_tpu.parallel.mesh import BATCH_AXIS, batch_spec

        batch = self.mesh.shape.get(BATCH_AXIS, 1)
        q = queries[0].shape[0]
        pad = (-q) % batch
        jqs = []
        for blk in queries:
            jb = jnp.asarray(blk, jnp.float32)
            if pad:
                jb = jnp.concatenate(
                    [jb, jnp.zeros((pad, jb.shape[1]), jnp.float32)]
                )
            jqs.append(jax.device_put(jb, batch_spec(self.mesh)))
        vals, idx = sharded_cflat_topk(
            self.mesh, field_state, self.valid, tuple(jqs), ratios,
            k=kk, metric=self.metric, compute_dtype=self.compute_dtype,
        )
        return np.asarray(vals)[:q], np.asarray(idx)[:q]

    @_locked
    def search_batch(
        self,
        query_fields: Sequence[Tuple[str, np.ndarray, float]],
        k: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch-native CFLAT search: each entry is (field, [Q, Df] query
        block, ratio%) for the *included* fields; every block must share the
        same Q. One device dispatch scores the whole batch (the per-field
        matmul is ~flat in Q until the MXU saturates). Returns
        (scores [Q, k], slots [Q, k]) with -1 slots on dead rows."""
        if not query_fields:
            raise ValueError("at least one included query vector block required")
        self.sync()
        names, queries, ratios = [], [], []
        nq = None
        for name, block, ratio in query_fields:
            if name not in self.fields:
                raise ValueError(f"unknown vector field {name!r}")
            block = np.asarray(block, np.float32)
            if block.ndim != 2 or block.shape[1] != self.fields[name]:
                raise ValueError(
                    f"field {name!r}: query block {block.shape} != "
                    f"[Q, {self.fields[name]}]"
                )
            if nq is None:
                nq = block.shape[0]
            elif block.shape[0] != nq:
                raise ValueError("all query blocks must share the same Q")
            names.append(name)
            queries.append(jnp.asarray(block))
            ratios.append(jnp.float32(float(ratio) / 100.0))

        field_state = tuple(
            (self.codes[n], self.scale[n], self.sqnorm[n]) for n in names
        )
        kk = min(max(1, int(k)), self.capacity)
        if self.mesh is not None and self.mesh.size > 1:
            vals, idx = self._sharded_cflat(
                field_state, tuple(queries), tuple(ratios), kk,
            )
        else:
            vals, idx = _cflat_topk_batch(
                field_state, tuple(queries), tuple(ratios), self.valid,
                k=kk, metric=self.metric, compute_dtype=self.compute_dtype,
            )
            vals, idx = np.asarray(vals), np.asarray(idx)
        idx = np.where(np.isneginf(vals), -1, idx)
        return vals, idx

    # -- persistence -------------------------------------------------------
    @_locked
    def save(self, f: io.BufferedIOBase) -> None:
        self.sync()
        header = {
            "fields": self.fields,
            "metric": int(self.metric),
            "quantization": int(self.quantization),
            "capacity": self.capacity,
            "next_slot": self._next_slot,
            "free": self._free,
            "pks": [[pk, slot] for pk, slot in self.pk_to_slot.items()],
        }
        hb = msgpack.packb(header, use_bin_type=True)
        f.write(_SNAPSHOT_MAGIC)
        f.write(len(hb).to_bytes(8, "big"))
        f.write(hb)
        for name in sorted(self.fields):
            f.write(np.asarray(jax.device_get(self.codes[name])).tobytes())
            f.write(np.asarray(jax.device_get(self.scale[name])).tobytes())
            f.write(np.asarray(jax.device_get(self.sqnorm[name])).tobytes())
        f.write(np.asarray(jax.device_get(self.valid)).tobytes())

    @classmethod
    def load(
        cls, f: io.BufferedIOBase, *,
        sharding: Optional[jax.sharding.Sharding] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> "MultiVectorStore":
        magic = f.read(len(_SNAPSHOT_MAGIC))
        if magic != _SNAPSHOT_MAGIC:
            raise ValueError("not a MultiVectorStore snapshot")
        hlen = int.from_bytes(f.read(8), "big")
        header = msgpack.unpackb(f.read(hlen), raw=False)
        store = cls(
            header["fields"],
            metric=Metric.parse(header["metric"]),
            quantization=Quantization.parse(header["quantization"]),
            base_capacity=header["capacity"],
            sharding=sharding,
            mesh=mesh,
        )
        cap = header["capacity"]
        qdt = np.dtype(store._qdtype)
        for name in sorted(store.fields):
            dim = store.fields[name]
            codes = np.frombuffer(f.read(cap * dim * qdt.itemsize), qdt).reshape(cap, dim)
            scale = np.frombuffer(f.read(cap * 4), np.float32).reshape(cap, 1)
            sqn = np.frombuffer(f.read(cap * 4), np.float32)
            store.codes[name] = store._put(jnp.asarray(codes))
            store.scale[name] = store._put(jnp.asarray(scale))
            store.sqnorm[name] = store._put(jnp.asarray(sqn))
        store.valid = store._put(
            jnp.asarray(np.frombuffer(f.read(cap), np.bool_))
        )
        store._next_slot = header["next_slot"]
        store._free = list(header["free"])
        store.pk_to_slot = {pk: slot for pk, slot in header["pks"]}
        store.slot_to_pk = {slot: pk for pk, slot in header["pks"]}
        return store

"""HNSW graph index: host construction, vectorized device beam search.

Reference parity: ``core/vectorindex/hnsw.go`` (Insert with greedy upper
descent + efConstruction beam per level, simple|heuristic neighbor
selection, bidirectional edges with pruneNeighbors at mMax; Search greedy to
level 0 then ef-bounded beam; Remove marks deleted + relinks neighbors;
RandomLevel from the exponential distribution), ``hnsw_config.go`` (the full
config surface: ef=20, efConstruction=200, m=16, mMax=m, mMax0=2m,
levelMultiplier=1/ln(m), Simple|Heuristic, extendCandidates/keepPruned) and
``hnsw_commit.go`` (Commit/Load binary snapshot).

TPU-native design (SURVEY.md §7 phase 7): the pointer-graph becomes
fixed-shape arrays. Construction mutates host numpy (adjacency as padded
int32 rows) exactly once per insert — vectorized numpy replaces the per-pair
SIMD distance calls. Search compiles to a *batched* beam: all Q queries
advance together under ``lax.while_loop``; each step expands the closest
unexpanded beam entries per query, gathers their padded neighbor rows,
masks already-visited ids against a [Q, N] visited map, scores the fresh
frontier with one einsum (MXU), and merges via ``lax.top_k``. Deleted
vertices stay traversable (like the reference, which relinks but tolerates
tombstones mid-search) and are filtered from results.

The upper-level greedy descent is O(hops*m) scalar work per query and runs
on host numpy against the same adjacency arrays; only the level-0 beam — the
hot loop (hnsw.go:345 searchLevel) — runs on device.
"""

from __future__ import annotations

import io
import math
import struct
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

from coltt_tpu.ops.distance import Metric

_SNAPSHOT_MAGIC = b"CTTHNSW1"

SIMPLE = "simple"
HEURISTIC = "heuristic"


@dataclass(frozen=True)
class HnswConfig:
    """Full reference config surface (hnsw_config.go:57-162)."""

    m: int = 16
    m_max: Optional[int] = None          # defaults to m
    m_max0: Optional[int] = None         # defaults to 2m
    ef: int = 20
    ef_construction: int = 200
    level_multiplier: Optional[float] = None  # defaults to 1/ln(m)
    algorithm: str = SIMPLE              # simple | heuristic
    heuristic_extend_candidates: bool = False
    heuristic_keep_pruned: bool = True

    def resolved(self) -> "HnswConfig":
        out = self
        if out.m_max is None:
            out = replace(out, m_max=out.m)
        if out.m_max0 is None:
            out = replace(out, m_max0=2 * out.m)
        if out.level_multiplier is None:
            out = replace(out, level_multiplier=1.0 / math.log(out.m))
        if out.algorithm not in (SIMPLE, HEURISTIC):
            raise ValueError(f"unknown algorithm {out.algorithm!r}")
        return out

    def to_dict(self) -> dict:
        c = self.resolved()
        return {
            "m": c.m, "m_max": c.m_max, "m_max0": c.m_max0, "ef": c.ef,
            "ef_construction": c.ef_construction,
            "level_multiplier": c.level_multiplier,
            "algorithm": c.algorithm,
            "heuristic_extend_candidates": c.heuristic_extend_candidates,
            "heuristic_keep_pruned": c.heuristic_keep_pruned,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HnswConfig":
        return cls(**d)


# ---------------------------------------------------------------------------
# device kernel: batched level-0 beam search
# ---------------------------------------------------------------------------

def _batched_dist(queries, vecs, sqn_q, sqn_v, metric: Metric):
    """queries [Q,D], vecs [Q,E,D] -> [Q,E] distances."""
    dots = jnp.einsum("qd,qed->qe", queries, vecs, preferred_element_type=jnp.float32)
    if metric == Metric.COSINE:
        den = jnp.sqrt(jnp.maximum(sqn_q[:, None] * sqn_v, 1e-30))
        return 1.0 - dots / den
    return jnp.maximum(sqn_q[:, None] + sqn_v - 2.0 * dots, 0.0)


@partial(jax.jit, static_argnames=("ef", "k", "expand", "max_iters", "metric"))
def _beam_search_l0(
    vectors, sqnorms, adj0, alive, queries, entry_ids,
    *, ef: int, k: int, expand: int, max_iters: int, metric: Metric,
):
    """Batched ef-bounded best-first search on the level-0 graph.

    vectors [N,D] f32, sqnorms [N] f32, adj0 [N,M0] int32 (-1 pad),
    alive [N] bool (False = tombstoned), queries [Q,D] f32, entry_ids [Q].
    Returns (dists [Q,k], ids [Q,k]) over alive vertices (pad id -1/inf).
    """
    n, _ = vectors.shape
    q = queries.shape[0]
    m0 = adj0.shape[1]
    qsq = jnp.sum(queries * queries, axis=1)
    q_iota = jnp.arange(q)

    # beam: ids [Q, ef] (-1 empty), dist [Q, ef] (+inf), expanded flag
    beam_ids = jnp.full((q, ef), -1, jnp.int32)
    beam_dist = jnp.full((q, ef), jnp.inf, jnp.float32)
    beam_exp = jnp.zeros((q, ef), jnp.bool_)

    e_vec = jnp.take(vectors, entry_ids, axis=0)
    e_sqn = jnp.take(sqnorms, entry_ids)
    d0 = _batched_dist(queries, e_vec[:, None, :], qsq, e_sqn[:, None], metric)[:, 0]
    beam_ids = beam_ids.at[:, 0].set(entry_ids)
    beam_dist = beam_dist.at[:, 0].set(d0)

    visited = jnp.zeros((q, n), jnp.bool_)
    visited = visited.at[q_iota, entry_ids].set(True)

    def cond(state):
        it, _, beam_dist, beam_exp, _ = state
        frontier = jnp.where(beam_exp, jnp.inf, beam_dist)
        has_work = jnp.any(jnp.isfinite(frontier))
        return jnp.logical_and(it < max_iters, has_work)

    def body(state):
        it, beam_ids, beam_dist, beam_exp, visited = state
        # pick the `expand` closest unexpanded beam entries per query
        frontier = jnp.where(beam_exp, jnp.inf, beam_dist)
        _, pick = jax.lax.top_k(-frontier, expand)              # [Q, E]
        pick_ids = jnp.take_along_axis(beam_ids, pick, axis=1)  # [Q, E]
        pick_live = jnp.isfinite(jnp.take_along_axis(frontier, pick, axis=1))
        beam_exp = beam_exp.at[q_iota[:, None], pick].set(
            jnp.take_along_axis(beam_exp, pick, axis=1) | pick_live
        )

        safe_pick = jnp.where(pick_live & (pick_ids >= 0), pick_ids, 0)
        nbrs = jnp.take(adj0, safe_pick, axis=0).reshape(q, expand * m0)
        nbr_ok = (nbrs >= 0) & jnp.repeat(pick_live, m0, axis=1)
        safe_nbrs = jnp.where(nbr_ok, nbrs, 0)

        seen = visited[q_iota[:, None], safe_nbrs]
        fresh = nbr_ok & ~seen
        # mark fresh as visited (scatter; duplicates in one row collapse fine)
        scatter_idx = jnp.where(fresh, nbrs, n)  # n = out-of-bounds -> dropped
        visited = visited.at[q_iota[:, None], scatter_idx].set(
            True, mode="drop"
        )
        # in-row duplicate neighbor ids: keep only the first occurrence
        first_hit = (
            jnp.argmax(
                (safe_nbrs[:, :, None] == safe_nbrs[:, None, :])
                & fresh[:, None, :],
                axis=2,
            )
            == jnp.arange(expand * m0)[None, :]
        )
        fresh = fresh & first_hit

        nvecs = jnp.take(vectors, safe_nbrs, axis=0)       # [Q, EM, D]
        nsqn = jnp.take(sqnorms, safe_nbrs)                # [Q, EM]
        ndist = _batched_dist(queries, nvecs, qsq, nsqn, metric)
        ndist = jnp.where(fresh, ndist, jnp.inf)

        all_ids = jnp.concatenate([beam_ids, nbrs], axis=1)
        all_dist = jnp.concatenate([beam_dist, ndist], axis=1)
        all_exp = jnp.concatenate(
            [beam_exp, jnp.ones((q, expand * m0), jnp.bool_)], axis=1
        )
        # fresh entries are unexpanded
        all_exp = all_exp.at[:, ef:].set(~fresh)

        negd, sel = jax.lax.top_k(-all_dist, ef)
        beam_ids = jnp.take_along_axis(all_ids, sel, axis=1)
        beam_dist = -negd
        beam_exp = jnp.take_along_axis(all_exp, sel, axis=1)
        return it + 1, beam_ids, beam_dist, beam_exp, visited

    _, beam_ids, beam_dist, beam_exp, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), beam_ids, beam_dist, beam_exp, visited)
    )

    # filter tombstoned vertices from results
    safe = jnp.where(beam_ids >= 0, beam_ids, 0)
    ok = (beam_ids >= 0) & jnp.take(alive, safe)
    final = jnp.where(ok, beam_dist, jnp.inf)
    negd, sel = jax.lax.top_k(-final, min(k, ef))
    ids = jnp.take_along_axis(beam_ids, sel, axis=1)
    dists = -negd
    ids = jnp.where(jnp.isinf(dists), -1, ids)
    return dists, ids


# ---------------------------------------------------------------------------
# host index
# ---------------------------------------------------------------------------

class HnswIndex:
    """HNSW over dense int slots (the engine maps external ids <-> slots)."""

    def __init__(
        self,
        dim: int,
        *,
        metric: Metric = Metric.COSINE,
        config: Optional[HnswConfig] = None,
        seed: int = 0,
        base_capacity: int = 1024,
    ):
        self.dim = int(dim)
        self.metric = Metric.parse(metric)
        if self.metric == Metric.MANHATTAN:
            raise ValueError("HNSW supports cosine/euclidean")
        self.config = (config or HnswConfig()).resolved()
        self._rng = np.random.default_rng(seed)

        cap = max(base_capacity, 1024)
        self._vecs = np.zeros((cap, self.dim), np.float32)
        self._sqn = np.zeros(cap, np.float32)
        self._levels = np.full(cap, -1, np.int32)   # -1 = unallocated
        self._alive = np.zeros(cap, bool)
        # adjacency: level -> [cap_l, width] padded int32 (-1)
        self._adj: List[np.ndarray] = [
            np.full((cap, self.config.m_max0), -1, np.int32)
        ]
        self._count = 0
        self._next = 0
        self._entry = -1          # entrypoint slot
        self._max_level = 0
        self._device_cache = None  # invalidated on mutation

    # -- internals ----------------------------------------------------------
    def _ensure_capacity(self, n: int) -> None:
        cap = self._vecs.shape[0]
        if n <= cap:
            return
        new = cap
        while new < n:
            new *= 2
        grow = new - cap
        self._vecs = np.concatenate([self._vecs, np.zeros((grow, self.dim), np.float32)])
        self._sqn = np.concatenate([self._sqn, np.zeros(grow, np.float32)])
        self._levels = np.concatenate([self._levels, np.full(grow, -1, np.int32)])
        self._alive = np.concatenate([self._alive, np.zeros(grow, bool)])
        for lvl in range(len(self._adj)):
            w = self._adj[lvl].shape[1]
            self._adj[lvl] = np.concatenate(
                [self._adj[lvl], np.full((grow, w), -1, np.int32)]
            )

    def _ensure_level(self, level: int) -> None:
        while len(self._adj) <= level:
            self._adj.append(
                np.full((self._vecs.shape[0], self.config.m_max), -1, np.int32)
            )

    def _dist_many(self, q: np.ndarray, ids: np.ndarray) -> np.ndarray:
        v = self._vecs[ids]
        dots = v @ q
        if self.metric == Metric.COSINE:
            qn = math.sqrt(float(q @ q)) or 1e-30
            vn = np.sqrt(np.maximum(self._sqn[ids], 1e-30))
            return 1.0 - dots / (qn * vn)
        return np.maximum(float(q @ q) + self._sqn[ids] - 2.0 * dots, 0.0)

    def random_level(self) -> int:
        # RandomLevel parity (hnsw.go:280-282): floor(-ln(U) * mL)
        u = self._rng.random()
        return int(-math.log(max(u, 1e-12)) * self.config.level_multiplier)

    # -- greedy upper descent (hnsw.go:320 greedyClosestNeighbor) -----------
    def _greedy_level(self, q: np.ndarray, start: int, level: int) -> int:
        cur = start
        cur_d = float(self._dist_many(q, np.array([cur]))[0])
        while True:
            nbrs = self._adj[level][cur]
            nbrs = nbrs[nbrs >= 0]
            if nbrs.size == 0:
                return cur
            ds = self._dist_many(q, nbrs)
            j = int(np.argmin(ds))
            if ds[j] < cur_d:
                cur, cur_d = int(nbrs[j]), float(ds[j])
            else:
                return cur

    # -- beam search on one level (hnsw.go:345 searchLevel), host numpy -----
    def _search_level(self, q: np.ndarray, entry: int, ef: int, level: int
                      ) -> List[Tuple[float, int]]:
        import heapq

        d0 = float(self._dist_many(q, np.array([entry]))[0])
        visited = {entry}
        cand = [(d0, entry)]                  # min-heap of frontier
        best: List[Tuple[float, int]] = [(-d0, entry)]  # max-heap (neg) of results
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbrs = self._adj[level][node]
            nbrs = [int(x) for x in nbrs[nbrs >= 0] if int(x) not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            ds = self._dist_many(q, np.array(nbrs))
            for nd, nn in zip(ds, nbrs):
                nd = float(nd)
                if len(best) < ef or nd < -best[0][0]:
                    heapq.heappush(cand, (nd, nn))
                    heapq.heappush(best, (-nd, nn))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted([(-d, n) for d, n in best])

    # -- neighbor selection (hnsw.go:399 selectNeighborsHeuristic) ----------
    def _select_neighbors(
        self, q: np.ndarray, candidates: List[Tuple[float, int]], m: int, level: int
    ) -> List[int]:
        if self.config.algorithm == SIMPLE or len(candidates) <= m:
            return [n for _, n in sorted(candidates)[:m]]
        cand = sorted(candidates)
        if self.config.heuristic_extend_candidates:
            seen = {n for _, n in cand}
            extra = []
            for _, n in list(cand):
                for nb in self._adj[level][n]:
                    nb = int(nb)
                    if nb >= 0 and nb not in seen:
                        seen.add(nb)
                        extra.append(nb)
            if extra:
                ds = self._dist_many(q, np.array(extra))
                cand = sorted(cand + list(zip(map(float, ds), extra)))
        selected: List[Tuple[float, int]] = []
        pruned: List[Tuple[float, int]] = []
        for d, n in cand:
            if len(selected) >= m:
                break
            # keep n only if it is closer to q than to any already-selected
            ok = True
            if selected:
                sel_ids = np.array([s for _, s in selected])
                dn = self._dist_many(self._vecs[n], sel_ids)
                ok = bool(np.all(d < dn))
            if ok:
                selected.append((d, n))
            else:
                pruned.append((d, n))
        if self.config.heuristic_keep_pruned:
            for d, n in pruned:
                if len(selected) >= m:
                    break
                selected.append((d, n))
        return [n for _, n in selected]

    def _add_edge(self, a: int, b: int, level: int) -> None:
        row = self._adj[level][a]
        if b in row:
            return
        slot = np.where(row < 0)[0]
        m_max = self.config.m_max0 if level == 0 else self.config.m_max
        if slot.size:
            row[slot[0]] = b
        else:
            # prune (hnsw.go:449 pruneNeighbors): keep best m_max among
            # existing + new by the configured selection algorithm
            ids = np.append(row[row >= 0], b)
            ds = self._dist_many(self._vecs[a], ids)
            keep = self._select_neighbors(
                self._vecs[a], list(zip(map(float, ds), map(int, ids))), m_max, level
            )
            new_row = np.full(row.shape, -1, np.int32)
            new_row[: len(keep)] = keep
            self._adj[level][a] = new_row

    # -- public API ----------------------------------------------------------
    def __len__(self) -> int:
        return self._count

    @property
    def entrypoint(self) -> int:
        return self._entry

    def insert(self, vector: np.ndarray, *, slot: Optional[int] = None,
               level: Optional[int] = None) -> int:
        """Insert (hnsw.go:104-167). Returns the slot."""
        q = np.asarray(vector, np.float32).reshape(-1)
        if q.shape[0] != self.dim:
            raise ValueError(f"dim {q.shape[0]} != index dim {self.dim}")
        if slot is None:
            slot = self._next
        self._next = max(self._next, slot + 1)
        self._ensure_capacity(self._next)
        if self._alive[slot] or self._levels[slot] >= 0:
            raise ValueError(f"slot {slot} already occupied")

        lvl = self.random_level() if level is None else int(level)
        self._ensure_level(lvl)
        self._vecs[slot] = q
        self._sqn[slot] = float(q @ q)
        self._levels[slot] = lvl
        self._alive[slot] = True
        self._count += 1
        self._device_cache = None

        if self._entry < 0:
            self._entry = slot
            self._max_level = lvl
            return slot

        cur = self._entry
        # greedy descend from top level to lvl+1
        for l in range(self._max_level, lvl, -1):
            cur = self._greedy_level(q, cur, l)
        # beam + connect from min(max_level, lvl) down to 0
        for l in range(min(self._max_level, lvl), -1, -1):
            cand = self._search_level(q, cur, self.config.ef_construction, l)
            m = self.config.m
            nbrs = self._select_neighbors(q, cand, m, l)
            for nb in nbrs:
                self._add_edge(slot, nb, l)
                self._add_edge(nb, slot, l)
            if cand:
                cur = cand[0][1]
        if lvl > self._max_level:
            self._max_level = lvl
            self._entry = slot
        return slot

    def remove(self, slot: int) -> bool:
        """Remove (hnsw.go:191-242): tombstone + relink neighbors so the
        graph stays connected through the hole."""
        if slot < 0 or slot >= self._levels.shape[0] or not self._alive[slot]:
            return False
        self._alive[slot] = False
        self._count -= 1
        self._device_cache = None
        for l in range(int(self._levels[slot]) + 1):
            nbrs = self._adj[l][slot]
            nbrs = [int(x) for x in nbrs[nbrs >= 0] if self._alive[int(x)]]
            # connect surviving neighbors pairwise (bounded)
            for i, a in enumerate(nbrs):
                for b in nbrs[i + 1:]:
                    self._add_edge(a, b, l)
                    self._add_edge(b, a, l)
        if slot == self._entry:
            # move entrypoint to any alive vertex at the highest level
            self._entry = -1
            for l in range(self._max_level, -1, -1):
                alive_at = np.where(self._alive & (self._levels >= l))[0]
                if alive_at.size:
                    self._entry = int(alive_at[0])
                    self._max_level = l
                    break
            if self._entry < 0:
                self._max_level = 0
        return True

    # -- search --------------------------------------------------------------
    def _device_graph(self):
        if self._device_cache is None:
            n = self._next
            self._device_cache = (
                jnp.asarray(self._vecs[:n]),
                jnp.asarray(self._sqn[:n]),
                jnp.asarray(self._adj[0][:n]),
                jnp.asarray(self._alive[:n]),
            )
        return self._device_cache

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        ef: Optional[int] = None,
        expand: int = 1,
        device: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched top-k search. Returns (dists [Q,k], slots [Q,k]); missing
        results carry slot -1 / dist inf."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        qn, _ = queries.shape
        ef = max(self.config.ef if ef is None else ef, k)
        if self._entry < 0 or self._count == 0:
            return (np.full((qn, k), np.inf, np.float32),
                    np.full((qn, k), -1, np.int32))

        # upper-level descent on host (cheap scalar hops)
        entries = np.empty(qn, np.int32)
        for i in range(qn):
            cur = self._entry
            for l in range(self._max_level, 0, -1):
                cur = self._greedy_level(queries[i], cur, l)
            entries[i] = cur

        if not device:
            dists = np.full((qn, k), np.inf, np.float32)
            slots = np.full((qn, k), -1, np.int32)
            for i in range(qn):
                res = [
                    (d, nid)
                    for d, nid in self._search_level(queries[i], int(entries[i]), ef, 0)
                    if self._alive[nid]
                ][:k]
                for j, (d, nid) in enumerate(res):
                    dists[i, j] = d
                    slots[i, j] = nid
            return dists, slots

        vectors, sqn, adj0, alive = self._device_graph()
        max_iters = max(2 * ef // max(expand, 1), 8)
        d, ids = _beam_search_l0(
            vectors, sqn, adj0, alive, jnp.asarray(queries), jnp.asarray(entries),
            ef=ef, k=k, expand=expand, max_iters=max_iters, metric=self.metric,
        )
        d, ids = np.asarray(d), np.asarray(ids)
        if d.shape[1] < k:
            pad = k - d.shape[1]
            d = np.concatenate([d, np.full((qn, pad), np.inf, np.float32)], axis=1)
            ids = np.concatenate([ids, np.full((qn, pad), -1, np.int32)], axis=1)
        return d, ids

    # -- snapshot (hnsw_commit.go Commit/Load parity) -------------------------
    def save(self, f: io.BufferedIOBase) -> None:
        n = self._next
        header = {
            "dim": self.dim,
            "metric": int(self.metric),
            "config": self.config.to_dict(),
            "entry": self._entry,
            "max_level": self._max_level,
            "count": self._count,
            "next": n,
            "levels": self._levels[:n].tolist(),
            "alive": self._alive[:n].tolist(),
        }
        hb = msgpack.packb(header, use_bin_type=True)
        f.write(_SNAPSHOT_MAGIC)
        f.write(len(hb).to_bytes(8, "big"))
        f.write(hb)
        f.write(self._vecs[:n].tobytes())
        f.write(struct.pack(">I", len(self._adj)))
        for lvl, adj in enumerate(self._adj):
            f.write(struct.pack(">II", adj.shape[1], n))
            f.write(adj[:n].astype(">i4").tobytes())

    @classmethod
    def load(cls, f: io.BufferedIOBase) -> "HnswIndex":
        magic = f.read(len(_SNAPSHOT_MAGIC))
        if magic != _SNAPSHOT_MAGIC:
            raise ValueError("not an HNSW snapshot")
        hlen = int.from_bytes(f.read(8), "big")
        h = msgpack.unpackb(f.read(hlen), raw=False)
        idx = cls(
            h["dim"],
            metric=Metric.parse(h["metric"]),
            config=HnswConfig.from_dict(h["config"]),
            base_capacity=max(h["next"], 1024),
        )
        n = h["next"]
        vecs = np.frombuffer(f.read(n * h["dim"] * 4), np.float32).reshape(n, h["dim"])
        idx._vecs[:n] = vecs
        idx._sqn[:n] = (vecs * vecs).sum(1)
        idx._levels[:n] = np.asarray(h["levels"], np.int32)
        idx._alive[:n] = np.asarray(h["alive"], bool)
        (nlevels,) = struct.unpack(">I", f.read(4))
        idx._adj = []
        for lvl in range(nlevels):
            width, rows = struct.unpack(">II", f.read(8))
            adj = np.frombuffer(f.read(rows * width * 4), ">i4").astype(np.int32)
            full = np.full((idx._vecs.shape[0], width), -1, np.int32)
            full[:rows] = adj.reshape(rows, width)
            idx._adj.append(full)
        idx._entry = h["entry"]
        idx._max_level = h["max_level"]
        idx._count = h["count"]
        idx._next = n
        return idx

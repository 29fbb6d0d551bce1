"""Cross-request scan batching (engine/batcher.py + edge engine wiring)."""

import threading

import numpy as np
import pytest

from coltt_tpu.engine.batcher import ScanBatcher


def _mk_scan(calls):
    def scan_fn(queries, k):
        calls.append(queries.shape[0])
        # score = first component, id = row index offset by first component
        scores = np.tile(-np.arange(k, dtype=np.float32), (queries.shape[0], 1))
        scores += queries[:, :1]
        ids = np.tile(np.arange(k, dtype=np.int32), (queries.shape[0], 1))
        return scores, ids

    return scan_fn


def test_single_request_passthrough():
    calls = []
    b = ScanBatcher(max_batch=8, max_wait_s=0.001)
    s, i = b.run("k", _mk_scan(calls), np.full(4, 7.0, np.float32), 3)
    assert s.shape == (1, 3) and i.shape == (1, 3)
    assert s[0, 0] == 7.0
    assert calls == [1]


def test_concurrent_requests_coalesce_and_route_rows():
    calls = []
    b = ScanBatcher(max_batch=64, max_wait_s=0.05)
    scan = _mk_scan(calls)
    results = {}
    errs = []

    def worker(v):
        try:
            s, i = b.run("k", scan, np.full(4, float(v), np.float32), 5)
            results[v] = s
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(v,)) for v in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # every request got ITS row back (score row encodes the query value)
    for v in range(16):
        assert results[v][0, 0] == float(v)
    # and at least some coalescing happened (fewer scans than requests)
    assert sum(calls) == 16
    assert len(calls) < 16


def test_full_batch_departs_without_waiting():
    calls = []
    b = ScanBatcher(max_batch=2, max_wait_s=10.0)  # wait would be 10s
    scan = _mk_scan(calls)
    out = {}

    def worker(v):
        out[v] = b.run("k", scan, np.full(2, float(v), np.float32), 2)

    ts = [threading.Thread(target=worker, args=(v,)) for v in range(2)]
    import time

    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert time.monotonic() - t0 < 5.0  # departed on max_batch, not the wait
    assert sorted(out) == [0, 1]


def test_scan_error_propagates_to_all_waiters():
    b = ScanBatcher(max_batch=8, max_wait_s=0.05)

    def bad_scan(queries, k):
        raise RuntimeError("scan exploded")

    errs = []

    def worker():
        try:
            b.run("k", bad_scan, np.zeros(2, np.float32), 1)
        except RuntimeError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == ["scan exploded"] * 4


def test_different_keys_do_not_mix():
    calls_a, calls_b = [], []
    b = ScanBatcher(max_batch=8, max_wait_s=0.02)
    sa, sb = _mk_scan(calls_a), _mk_scan(calls_b)
    out = {}

    def worker(key, scan, v):
        out[(key, v)] = b.run(key, scan, np.full(2, float(v), np.float32), 2)

    ts = [threading.Thread(target=worker, args=("a", sa, v)) for v in range(3)]
    ts += [threading.Thread(target=worker, args=("b", sb, v)) for v in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # batches are padded to power-of-two rows (3 -> 4 when coalesced), so
    # each scan sees >= its own 3 rows and never the other key's
    assert 3 <= sum(calls_a) <= 4 and 3 <= sum(calls_b) <= 4
    for key in ("a", "b"):
        for v in range(3):
            assert out[(key, v)][0][0, 0] == float(v)


def test_edge_engine_batched_search_equals_direct(tmp_path):
    """Concurrent engine.search calls coalesce and return per-query-correct
    results identical to the unbatched engine."""
    from coltt_tpu.engine.edge import EdgeEngine
    from coltt_tpu.index.schema import CollectionSchema, FieldSchema, FieldType
    from coltt_tpu.storage.objectstore import LocalObjectStore

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((256, 32)).astype(np.float32)
    schema = CollectionSchema(
        name="c", dim=32,
        fields=(FieldSchema(name="pk", type=FieldType.STRING, primary_key=True),),
    )

    def mk(root, **kw):
        eng = EdgeEngine(LocalObjectStore(str(root)), **kw)
        eng.create_collection(schema)
        for j in range(256):
            eng.index("c", {"pk": f"p{j}"}, vecs[j])
        return eng

    eng_b = mk(tmp_path / "b", batch_max=64, batch_wait_s=0.05)
    eng_d = mk(tmp_path / "d", batch_max=1)
    assert eng_b._batcher is not None and eng_d._batcher is None

    got = {}
    # all workers reach the batcher together — without the barrier, slow
    # scheduling can serialize arrivals into 12 single-query batches and
    # flake the coalescing assertion
    barrier = threading.Barrier(12)

    def worker(j):
        barrier.wait()
        got[j] = eng_b.search("c", vecs[j], limit=3)

    ts = [threading.Thread(target=worker, args=(j,)) for j in range(12)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for j in range(12):
        want = eng_d.search("c", vecs[j], limit=3)
        assert [h.id for h in got[j]] == [h.id for h in want]
        assert got[j][0].id == f"p{j}"
    assert eng_b._batcher.requests_served == 12
    assert eng_b._batcher.batches_run < 12

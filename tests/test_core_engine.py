"""Core engine tests: lifecycle, commit-log recovery, rollback, searches."""

import numpy as np
import pytest

from coltt_tpu.engine.core import CollectionSpec, CoreEngine
from coltt_tpu.engine.errors import EngineError
from coltt_tpu.ops.distance import Metric
from coltt_tpu.store.hnsw import HnswConfig

DIM = 16


def _spec(name="c1"):
    return CollectionSpec(
        name=name, dim=DIM, metric=Metric.COSINE,
        config=HnswConfig(m=6, ef_construction=40),
    )


@pytest.fixture
def engine(tmp_path):
    e = CoreEngine(str(tmp_path / "data"))
    yield e
    e.kv.close() if not e.kv._lock_f.closed else None


def _fill(engine, rng, n=30, name="c1"):
    vecs = rng.standard_normal((n, DIM), dtype=np.float32)
    ids = []
    for i in range(n):
        ids.append(
            engine.insert(name, vecs[i], {"tag": f"t{i % 3}", "i": i}, ext_id=f"id{i}")
        )
    return vecs, ids


def test_lifecycle_and_vector_search(engine, rng):
    engine.create_collection(_spec())
    vecs, ids = _fill(engine, rng)
    info = engine.collection_info("c1")
    assert info["size"] == 30 and info["loaded"]
    hits = engine.vector_search("c1", vecs[9], top_k=3)
    assert hits[0].id == "id9"
    assert hits[0].score > 99.9
    assert hits[0].metadata["i"] == 9


def test_insert_duplicate_id_rejected(engine, rng):
    engine.create_collection(_spec())
    v = rng.standard_normal(DIM, dtype=np.float32)
    engine.insert("c1", v, {}, ext_id="dup")
    with pytest.raises(EngineError):
        engine.insert("c1", v, {}, ext_id="dup")


def test_update_and_fallback_insert(engine, rng):
    engine.create_collection(_spec())
    vecs, _ = _fill(engine, rng, n=10)
    nv = rng.standard_normal(DIM, dtype=np.float32)
    engine.update("c1", "id4", nv, {"tag": "new", "i": 4})
    hits = engine.vector_search("c1", nv, top_k=1)
    assert hits[0].id == "id4" and hits[0].metadata["tag"] == "new"
    # unknown id falls back to insert
    engine.update("c1", "brand-new", nv * 2, {"tag": "x", "i": 99})
    assert engine.collection_info("c1")["size"] == 11


def test_delete(engine, rng):
    engine.create_collection(_spec())
    vecs, _ = _fill(engine, rng, n=10)
    assert engine.delete("c1", "id5")
    assert not engine.delete("c1", "id5")
    hits = engine.vector_search("c1", vecs[5], top_k=5)
    assert "id5" not in [h.id for h in hits]


def test_filter_and_hybrid_search(engine, rng):
    engine.create_collection(_spec())
    vecs, _ = _fill(engine, rng)
    hits = engine.filter_search("c1", {"tag": "t1"}, top_k=30, vector=vecs[1])
    assert hits and all(h.metadata["tag"] == "t1" for h in hits)
    assert hits[0].id == "id1"
    hits = engine.hybrid_search("c1", vecs[4], {"tag": "t1"}, top_k=5)
    assert all(h.metadata["tag"] == "t1" for h in hits)
    assert hits[0].id == "id4"  # id4 has tag t1 and is closest to itself


def test_snapshot_release_load(engine, rng):
    engine.create_collection(_spec())
    vecs, _ = _fill(engine, rng, n=20)
    msg = engine.release_collection("c1")
    assert "released" in msg
    assert not engine.collection_info("c1")["loaded"]
    engine.load_collection("c1")
    hits = engine.vector_search("c1", vecs[8], top_k=1)
    assert hits[0].id == "id8"


def test_crash_recovery_from_commit_log(tmp_path, rng):
    e1 = CoreEngine(str(tmp_path / "data"))
    e1.create_collection(_spec())
    vecs = rng.standard_normal((15, DIM), dtype=np.float32)
    for i in range(15):
        e1.insert("c1", vecs[i], {"i": i}, ext_id=f"id{i}")
    e1.delete("c1", "id3")
    # simulate crash: NO release/close snapshot; drop the lock
    e1.kv._wal.sync()
    e1.kv._lock_f.close()

    e2 = CoreEngine(str(tmp_path / "data"))
    assert e2.state.exists("c1")
    info = e2.load_collection("c1")  # dirty -> rebuilt from log
    assert info["size"] == 14
    hits = e2.vector_search("c1", vecs[7], top_k=1)
    assert hits[0].id == "id7" and hits[0].metadata["i"] == 7
    hits = e2.vector_search("c1", vecs[3], top_k=14)
    assert "id3" not in [h.id for h in hits]
    e2.close()


def test_clean_shutdown_uses_snapshot(tmp_path, rng):
    e1 = CoreEngine(str(tmp_path / "data"))
    e1.create_collection(_spec())
    vecs = rng.standard_normal((10, DIM), dtype=np.float32)
    for i in range(10):
        e1.insert("c1", vecs[i], {"i": i}, ext_id=f"id{i}")
    e1.close()  # snapshots + clears dirty
    e2 = CoreEngine(str(tmp_path / "data"))
    assert not e2.kv.exists(b"__dirty__c1")
    e2.load_collection("c1")
    hits = e2.vector_search("c1", vecs[2], top_k=1)
    assert hits[0].id == "id2"
    e2.close()


def test_drop_collection_removes_everything(tmp_path, rng):
    e = CoreEngine(str(tmp_path / "data"))
    e.create_collection(_spec())
    v = rng.standard_normal(DIM, dtype=np.float32)
    e.insert("c1", v, {}, ext_id="x")
    e.release_collection("c1")
    e.drop_collection("c1")
    assert not e.state.exists("c1")
    assert not e.kv.keys(b"c1\x1f")
    with pytest.raises(EngineError):
        e.collection_info("c1")
    e.close()


def test_compare_dist():
    x = np.array([1.0, 0.0], np.float32)
    assert CoreEngine.compare_dist(x, x, Metric.COSINE) == pytest.approx(100.0)
    y = np.array([0.0, 1.0], np.float32)
    assert CoreEngine.compare_dist(x, y, Metric.COSINE) == pytest.approx(50.0)
    assert CoreEngine.compare_dist(x, y, Metric.EUCLIDEAN) == pytest.approx(98.0)


def test_dimension_validation(engine, rng):
    engine.create_collection(_spec())
    with pytest.raises(EngineError):
        engine.insert("c1", np.zeros(3, np.float32), {})


def test_min_score_threshold(engine, rng):
    engine.create_collection(_spec())
    vecs, _ = _fill(engine, rng, n=10)
    all_hits = engine.vector_search("c1", vecs[0], top_k=10)
    thresh = all_hits[1].score + 0.01
    few = engine.vector_search("c1", vecs[0], top_k=10, min_score=thresh)
    assert len(few) < len(all_hits)
    assert all(h.score >= thresh for h in few)


def test_bulk_insert_empty_collection(engine, rng):
    engine.create_collection(_spec())
    n = 300
    vecs = rng.standard_normal((n, DIM), dtype=np.float32)
    mds = [{"tag": f"t{i % 3}", "i": i} for i in range(n)]
    ids = engine.bulk_insert("c1", vecs, mds, ext_ids=[f"b{i}" for i in range(n)])
    assert len(ids) == n and ids[5] == "b5"
    assert engine.collection_info("c1")["size"] == n
    hits = engine.vector_search("c1", vecs[42], top_k=3)
    assert hits[0].id == "b42" and hits[0].metadata["i"] == 42
    # filter search over bulk metadata
    hits = engine.filter_search("c1", {"tag": "t1"}, top_k=5, vector=vecs[1])
    assert hits and all(h.metadata["tag"] == "t1" for h in hits)


def test_bulk_insert_nonempty_falls_back(engine, rng):
    engine.create_collection(_spec())
    _fill(engine, rng, n=5)
    vecs = rng.standard_normal((4, DIM), dtype=np.float32)
    ids = engine.bulk_insert("c1", vecs, ext_ids=[f"x{i}" for i in range(4)])
    assert engine.collection_info("c1")["size"] == 9
    hits = engine.vector_search("c1", vecs[2], top_k=1)
    assert hits[0].id == "x2"


def test_bulk_insert_survives_restart(tmp_path, rng):
    data = str(tmp_path / "data")
    e = CoreEngine(data)
    e.create_collection(_spec())
    vecs = rng.standard_normal((50, DIM), dtype=np.float32)
    e.bulk_insert("c1", vecs, ext_ids=[f"r{i}" for i in range(50)])
    e.kv.close()  # crash: no snapshot written

    e2 = CoreEngine(data)
    e2.load_collection("c1")  # replays the commit log
    hits = e2.vector_search("c1", vecs[7], top_k=1)
    assert hits[0].id == "r7"
    e2.close()


def test_bulk_insert_validation(engine, rng):
    engine.create_collection(_spec())
    with pytest.raises(EngineError):
        engine.bulk_insert("c1", rng.standard_normal((3, DIM + 1)).astype(np.float32))
    with pytest.raises(EngineError):
        engine.bulk_insert(
            "c1", rng.standard_normal((2, DIM)).astype(np.float32),
            ext_ids=["a", "a"],
        )

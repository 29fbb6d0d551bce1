"""Edge engine lifecycle/mutation/search tests (edge/edge.go parity)."""

import numpy as np
import pytest

from coltt_tpu.engine.edge import EdgeEngine
from coltt_tpu.engine.errors import EngineError
from coltt_tpu.index.filter import And, Filter, Op
from coltt_tpu.index.schema import CollectionSchema, FieldSchema, FieldType
from coltt_tpu.ops.quant import Quantization
from coltt_tpu.storage.objectstore import LocalObjectStore
from coltt_tpu.store.flat import FlatStore


DIM = 24


def _schema(name="col1", versioning=False):
    return CollectionSchema(
        name=name,
        dim=DIM,
        quantization=Quantization.F16,
        versioning=versioning,
        fields=[
            FieldSchema("pk", FieldType.STRING, primary_key=True),
            FieldSchema("city", FieldType.STRING),
            FieldSchema("stars", FieldType.INTEGER, enable_null=True),
        ],
    )


@pytest.fixture
def engine(tmp_path):
    return EdgeEngine(LocalObjectStore(str(tmp_path / "os")))


def _fill(engine, rng, n=40, name="col1"):
    vecs = rng.standard_normal((n, DIM), dtype=np.float32)
    mds = [
        {"pk": f"p{i}", "city": ["seoul", "tokyo"][i % 2], "stars": i % 5}
        for i in range(n)
    ]
    engine.index_many(name, mds, vecs)
    return vecs, mds


def test_lifecycle(engine, rng):
    info = engine.create_collection(_schema())
    assert info["loaded"] and info["size"] == 0
    with pytest.raises(EngineError):
        engine.create_collection(_schema())  # duplicate
    vecs, _ = _fill(engine, rng)
    assert engine.get_collection("col1")["size"] == 40
    engine.release_collection("col1")
    assert not engine.get_collection("col1")["loaded"]
    with pytest.raises(EngineError):
        engine.search("col1", vecs[0], limit=1)  # not loaded
    engine.load_collection("col1")
    hits = engine.search("col1", vecs[7], limit=1)
    assert hits[0].id == "p7"
    engine.delete_collection("col1")
    with pytest.raises(EngineError):
        engine.get_collection("col1")


def test_search_with_metadata_and_scores(engine, rng):
    engine.create_collection(_schema())
    vecs, mds = _fill(engine, rng)
    hits = engine.search("col1", vecs[11], limit=3)
    assert hits[0].id == "p11"
    assert hits[0].score > 99.9
    assert hits[0].metadata["city"] == "tokyo"
    assert len(hits) == 3
    assert hits[0].score >= hits[1].score >= hits[2].score


def test_filtered_search(engine, rng):
    engine.create_collection(_schema())
    vecs, _ = _fill(engine, rng)
    expr = And(Filter("city", Op.EQ, "seoul"), Filter("stars", Op.GTE, 2))
    hits = engine.search("col1", vecs[0], limit=20, filter_expression=expr)
    assert hits
    for h in hits:
        assert h.metadata["city"] == "seoul"
        assert h.metadata["stars"] >= 2
    # dict-form filter (wire format) also accepted
    hits2 = engine.search(
        "col1", vecs[0], limit=20, filter_expression=expr.to_dict()
    )
    assert [h.id for h in hits2] == [h.id for h in hits]


def test_offset_pagination(engine, rng):
    engine.create_collection(_schema())
    vecs, _ = _fill(engine, rng)
    page1 = engine.search("col1", vecs[0], limit=5, offset=0)
    page2 = engine.search("col1", vecs[0], limit=5, offset=5)
    assert len(page1) == 5 and len(page2) == 5
    assert {h.id for h in page1}.isdisjoint({h.id for h in page2})
    assert page1[-1].score >= page2[0].score


def test_update_and_delete(engine, rng):
    engine.create_collection(_schema())
    vecs, _ = _fill(engine, rng, n=10)
    new_vec = rng.standard_normal(DIM, dtype=np.float32)
    engine.index("col1", {"pk": "p3", "city": "osaka", "stars": 1}, new_vec)
    assert engine.get_collection("col1")["size"] == 10  # overwrite, not insert
    hits = engine.search("col1", new_vec, limit=1)
    assert hits[0].id == "p3" and hits[0].metadata["city"] == "osaka"
    # old metadata no longer matches filters
    hits = engine.search(
        "col1", new_vec, limit=10,
        filter_expression=Filter("city", Op.EQ, "tokyo"),
    )
    assert "p3" not in [h.id for h in hits]
    engine.index("col1", {"pk": "p3"}, delete=True)
    assert engine.get_collection("col1")["size"] == 9
    hits = engine.search("col1", new_vec, limit=9)
    assert "p3" not in [h.id for h in hits]


def test_flush_and_reload_across_engines(tmp_path, rng):
    store = LocalObjectStore(str(tmp_path / "os"))
    e1 = EdgeEngine(store)
    e1.create_collection(_schema(versioning=True))
    vecs, _ = _fill(e1, rng, n=20)
    e1.flush("col1")
    e1.close()
    # fresh engine over the same object store (process restart)
    e2 = EdgeEngine(store)
    assert e2.state.exists("col1")
    info = e2.load_collection("col1")
    assert info["size"] == 20
    hits = e2.search("col1", vecs[13], limit=1)
    assert hits[0].id == "p13"
    assert hits[0].metadata["stars"] == 13 % 5


def test_schema_validation_at_index(engine, rng):
    engine.create_collection(_schema())
    v = rng.standard_normal(DIM, dtype=np.float32)
    with pytest.raises(EngineError):
        engine.index("col1", {"city": "x"}, v)  # missing pk
    with pytest.raises(EngineError):
        engine.index("col1", {"pk": "a", "city": 5}, v)  # type mismatch
    with pytest.raises(EngineError):
        engine.index("col1", {"pk": "a", "city": "x", "nope": 1}, v)
    with pytest.raises(ValueError):
        engine.index("col1", {"pk": "a", "city": "x"}, v[:4])  # bad dim


def test_requires_primary_key_schema(engine):
    bad = CollectionSchema(
        name="nopk", dim=4, fields=[FieldSchema("x", FieldType.STRING)]
    )
    with pytest.raises(EngineError):
        engine.create_collection(bad)


def test_pq_collection_end_to_end(engine, rng):
    """PQ quantization through the full engine surface: create -> index ->
    search -> flush -> release -> load -> search (reference's reserved
    Quantization_PQ, realized via ops.pq + the FlatStore scan cache)."""
    schema = CollectionSchema(
        name="pqcol",
        dim=32,
        quantization=Quantization.PQ,
        fields=[
            FieldSchema("pk", FieldType.STRING, primary_key=True),
            FieldSchema("city", FieldType.STRING),
        ],
    )
    engine.create_collection(schema)
    centers = rng.standard_normal((8, 32)).astype(np.float32)
    vecs = (centers[rng.integers(0, 8, 300)]
            + 0.05 * rng.standard_normal((300, 32)).astype(np.float32))
    mds = [{"pk": f"p{i}", "city": ["a", "b"][i % 2]} for i in range(300)]
    engine.index_many("pqcol", mds, vecs)

    hits = engine.search("pqcol", vecs[11], limit=20)
    assert "p11" in [h.id for h in hits]
    # filtered search composes with PQ
    hits = engine.search("pqcol", vecs[11], limit=20,
                         filter_expression=Filter("city", Op.EQ, "b"))
    assert all(h.metadata["city"] == "b" for h in hits)

    engine.flush("pqcol")
    engine.release_collection("pqcol")
    engine.load_collection("pqcol")
    hits = engine.search("pqcol", vecs[11], limit=20)
    assert "p11" in [h.id for h in hits]


def test_high_resource_toggle_uses_approx(engine, rng):
    engine.create_collection(_schema())
    vecs, _ = _fill(engine, rng)
    hits = engine.search("col1", vecs[3], limit=5, high_resource=True)
    assert hits[0].id == "p3"


def test_load_collection_precompiles_serving_shapes(tmp_path, rng):
    """Latency mode (VERDICT r4 #6): LoadCollection compiles the
    configured small-batch serving shapes before returning, so a cold
    first RPC pays no compile. Observed by counting store.search calls
    during load."""
    store_dir = LocalObjectStore(str(tmp_path / "os"))
    e1 = EdgeEngine(store_dir, precompile_batches=(1, 4))
    e1.create_collection(_schema())
    _fill(e1, rng)
    e1.release_collection("col1")

    calls = []
    orig_load = FlatStore.load.__func__

    def counting_load(cls, f, **kw):
        store = orig_load(cls, f, **kw)
        orig_search = store.search

        def counting_search(q, k, **skw):
            calls.append((np.atleast_2d(np.asarray(q)).shape[0], k))
            return orig_search(q, k, **skw)

        store.search = counting_search
        return store

    FlatStore.load = classmethod(counting_load)
    try:
        e1.load_collection("col1")
    finally:
        FlatStore.load = classmethod(orig_load)
    # 2 variants (default + high_resource) per configured batch size
    assert sorted(calls) == [(1, 10), (1, 10), (4, 10), (4, 10)], calls
    # and the loaded collection still serves correctly
    hits = e1.search("col1", np.ones(DIM, np.float32), limit=3)
    assert len(hits) == 3

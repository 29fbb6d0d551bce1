"""Experimental (CFLAT multi-vector) engine tests."""

import numpy as np
import pytest

from coltt_tpu.engine.errors import EngineError
from coltt_tpu.engine.experimental import ExperimentalEngine
from coltt_tpu.index.schema import CollectionSchema, FieldSchema, FieldType
from coltt_tpu.storage.objectstore import LocalObjectStore

DIM = 12


def _schema(name="mv1"):
    return CollectionSchema(
        name=name,
        dim=DIM,
        fields=[
            FieldSchema("title_vec", FieldType.VECTOR),
            FieldSchema("body_vec", FieldType.VECTOR),
            FieldSchema("lang", FieldType.STRING, enable_null=True),
        ],
    )


@pytest.fixture
def engine(tmp_path):
    return ExperimentalEngine(LocalObjectStore(str(tmp_path / "os")))


def _fill(engine, rng, n=25, name="mv1"):
    t = rng.standard_normal((n, DIM), dtype=np.float32)
    b = rng.standard_normal((n, DIM), dtype=np.float32)
    for i in range(n):
        engine.index(
            name, f"r{i}",
            vectors={"title_vec": t[i], "body_vec": b[i]},
            metadata={"lang": ["ko", "en"][i % 2]},
        )
    return t, b


def test_create_requires_vector_field(engine):
    bad = CollectionSchema(
        name="x", dim=DIM, fields=[FieldSchema("lang", FieldType.STRING)]
    )
    with pytest.raises(EngineError):
        engine.create_collection(bad)


def test_multi_vector_search(engine, rng):
    engine.create_collection(_schema())
    t, b = _fill(engine, rng)
    hits = engine.vector_search(
        "mv1",
        [("title_vec", t[7], True, 50.0), ("body_vec", b[7], True, 50.0)],
        top_k=3,
    )
    assert hits[0].id == "r7"
    assert hits[0].score > 99.0
    assert hits[0].metadata["lang"] == "en"


def test_include_flag_excludes_field(engine, rng):
    engine.create_collection(_schema())
    t, b = _fill(engine, rng)
    hits = engine.vector_search(
        "mv1",
        [("title_vec", t[4], True, 100.0), ("body_vec", b[9], False, 0.0)],
        top_k=1,
    )
    assert hits[0].id == "r4"
    with pytest.raises(EngineError):
        engine.vector_search("mv1", [("title_vec", t[0], False, 100.0)], top_k=1)


def test_delete_record(engine, rng):
    engine.create_collection(_schema())
    t, b = _fill(engine, rng, n=10)
    engine.index("mv1", "r5", delete=True)
    assert engine.get_collection("mv1")["size"] == 9
    hits = engine.vector_search("mv1", [("title_vec", t[5], True, 100.0)], top_k=9)
    assert "r5" not in [h.id for h in hits]


def test_flush_reload_roundtrip(tmp_path, rng):
    store = LocalObjectStore(str(tmp_path / "os"))
    e1 = ExperimentalEngine(store)
    e1.create_collection(_schema())
    t, b = _fill(e1, rng, n=15)
    e1.close()
    e2 = ExperimentalEngine(store)
    e2.load_collection("mv1")
    hits = e2.vector_search(
        "mv1", [("title_vec", t[11], True, 60.0), ("body_vec", b[11], True, 40.0)],
        top_k=1,
    )
    assert hits[0].id == "r11"
    assert hits[0].metadata["lang"] == "en"


def test_missing_field_rejected(engine, rng):
    engine.create_collection(_schema())
    with pytest.raises(EngineError):
        engine.index(
            "mv1", "bad", vectors={"title_vec": np.zeros(DIM, np.float32)},
            metadata={},
        )
    with pytest.raises(EngineError):
        engine.index("mv1", "", vectors=None, metadata={})

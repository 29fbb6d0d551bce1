"""CFLAT multi-vector store tests (experimental engine parity)."""

import io

import numpy as np
import pytest

from coltt_tpu.ops.distance import Metric
from coltt_tpu.store.multivec import MultiVectorStore


FIELDS = {"title": 16, "body": 32}


def _mk(rng, n=60):
    store = MultiVectorStore(FIELDS, metric=Metric.COSINE)
    data = {
        name: rng.standard_normal((n, dim), dtype=np.float32)
        for name, dim in FIELDS.items()
    }
    for i in range(n):
        store.upsert(f"pk{i}", {name: data[name][i] for name in FIELDS})
    return store, data


def test_weighted_search_prefers_weighted_field(rng):
    store, data = _mk(rng)
    # query matches record 7's title exactly, random body; full weight on title
    scores, slots = store.search(
        [("title", data["title"][7], 100.0)], k=1
    )
    assert store.slot_to_pk[int(slots[0])] == "pk7"
    assert scores[0] > 99.0


def test_weighted_sum_matches_manual(rng):
    store, data = _mk(rng, n=40)
    qt = rng.standard_normal(16, dtype=np.float32)
    qb = rng.standard_normal(32, dtype=np.float32)
    scores, slots = store.search([("title", qt, 60.0), ("body", qb, 40.0)], k=5)

    def cos_score(q, v):
        c = 1 - (v @ q) / (np.linalg.norm(q) * np.linalg.norm(v, axis=1))
        return ((2 - c) / 2) * 100

    manual = 0.6 * cos_score(qt, data["title"]) + 0.4 * cos_score(qb, data["body"])
    want = np.argsort(-manual)[:5]
    got = [store.slot_to_pk[int(s)] for s in slots]
    assert got == [f"pk{i}" for i in want]
    np.testing.assert_allclose(scores, np.sort(manual)[::-1][:5], rtol=1e-4)


def test_excluded_field_is_omitted(rng):
    store, data = _mk(rng, n=20)
    # only body included (include_or_not=false for title = omit it)
    scores, slots = store.search([("body", data["body"][3], 100.0)], k=1)
    assert store.slot_to_pk[int(slots[0])] == "pk3"


def test_search_batch_matches_single(rng):
    """Batch-native CFLAT (search_batch) must rank identically to Q single
    searches — same weighted-sum key, one device dispatch."""
    store, data = _mk(rng, n=50)
    nq = 7
    qt = rng.standard_normal((nq, 16), dtype=np.float32)
    qb = rng.standard_normal((nq, 32), dtype=np.float32)
    bs, bslots = store.search_batch(
        [("title", qt, 60.0), ("body", qb, 40.0)], k=4
    )
    assert bs.shape == (nq, 4) and bslots.shape == (nq, 4)
    for q in range(nq):
        ss, sslots = store.search(
            [("title", qt[q], 60.0), ("body", qb[q], 40.0)], k=4
        )
        np.testing.assert_array_equal(bslots[q], sslots)
        np.testing.assert_allclose(bs[q], ss, rtol=1e-5)


def test_search_batch_validation(rng):
    store, _ = _mk(rng, n=10)
    with pytest.raises(ValueError, match="same Q"):
        store.search_batch(
            [("title", np.zeros((2, 16), np.float32), 50.0),
             ("body", np.zeros((3, 32), np.float32), 50.0)], k=2
        )
    with pytest.raises(ValueError, match="query block"):
        store.search_batch([("title", np.zeros((16,), np.float32), 100.0)], k=2)
    with pytest.raises(ValueError, match="unknown"):
        store.search_batch([("nope", np.zeros((2, 16), np.float32), 100.0)], k=2)


def test_upsert_delete(rng):
    store, data = _mk(rng, n=10)
    assert len(store) == 10
    store.delete("pk4")
    assert len(store) == 9
    _, slots = store.search([("title", data["title"][4], 100.0)], k=1)
    assert store.slot_to_pk.get(int(slots[0])) != "pk4"


def test_validation(rng):
    store, _ = _mk(rng, n=4)
    with pytest.raises(ValueError):
        store.upsert("x", {"title": np.zeros(16, np.float32)})  # missing body
    with pytest.raises(ValueError):
        store.upsert(
            "x",
            {"title": np.zeros(16), "body": np.zeros(32), "zzz": np.zeros(4)},
        )
    with pytest.raises(ValueError):
        store.upsert("x", {"title": np.zeros(99), "body": np.zeros(32)})
    with pytest.raises(ValueError):
        store.search([], k=1)
    with pytest.raises(ValueError):
        store.search([("nope", np.zeros(16), 100.0)], k=1)


def test_snapshot_roundtrip(rng):
    store, data = _mk(rng, n=30)
    store.delete("pk2")
    buf = io.BytesIO()
    store.save(buf)
    buf.seek(0)
    back = MultiVectorStore.load(buf)
    assert back.pk_to_slot == store.pk_to_slot
    q = [("title", data["title"][9], 50.0), ("body", data["body"][9], 50.0)]
    s1, i1 = store.search(q, k=3)
    s2, i2 = back.search(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

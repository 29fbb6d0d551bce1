"""Network object-store client vs an in-process fake S3 server.

Exercises coltt_tpu.storage.s3.S3ObjectStore (SigV4 path-style client —
pkg/minio parity) end to end: bucket CRUD, versioning + version GC, and
the real payoff — an edge-engine checkpoint round trip through the
network client (the reference stores edge collections in MinIO,
edge/edge.go:482-553)."""

import numpy as np
import pytest

from coltt_tpu.storage.s3 import S3Error, S3ObjectStore
from tests.fake_s3 import start_fake_s3


@pytest.fixture
def s3():
    srv, addr = start_fake_s3()
    yield S3ObjectStore(addr, "minioadmin", "minioadmin")
    srv.shutdown()


def test_bucket_lifecycle(s3):
    assert s3.list_buckets() == []
    s3.create_bucket("col1")
    s3.create_bucket("col2", versioning=True)
    assert s3.bucket_exists("col1")
    assert not s3.bucket_exists("ghost")
    assert s3.list_buckets() == ["col1", "col2"]
    assert not s3.bucket_versioning("col1")
    assert s3.bucket_versioning("col2")
    s3.delete_bucket("col1")
    assert s3.list_buckets() == ["col2"]
    s3.delete_bucket("ghost")  # idempotent


def test_object_roundtrip(s3):
    s3.create_bucket("b")
    assert s3.get_object("b", "x.bin") is None
    assert not s3.object_exists("b", "x.bin")
    payload = bytes(range(256)) * 100
    s3.put_object("b", "x.bin", payload)
    assert s3.get_object("b", "x.bin") == payload
    assert s3.object_exists("b", "x.bin")
    s3.put_object("b", "sub.dir/y.bin", b"nested")
    assert s3.list_objects("b") == ["sub.dir/y.bin", "x.bin"]
    s3.delete_object("b", "x.bin")
    assert s3.get_object("b", "x.bin") is None
    # bucket delete purges remaining objects first (S3 requires empty)
    s3.delete_bucket("b")
    assert not s3.bucket_exists("b")


def test_versioning_and_cleanup(s3):
    s3.create_bucket("v", versioning=True)
    for i in range(5):
        s3.put_object("v", "obj", f"rev{i}".encode())
    assert s3.get_object("v", "obj") == b"rev4"
    assert len(s3.list_versions("v", "obj")) == 5
    purged = s3.cleanup_versions("v", "obj", keep=2)
    assert purged == 3
    assert len(s3.list_versions("v", "obj")) == 2
    assert s3.get_object("v", "obj") == b"rev4"  # newest survives


def test_error_surfaces(s3):
    with pytest.raises(S3Error):
        s3.put_object("nope", "x", b"1")  # no such bucket
    # a missing bucket reads as missing object (404 -> None), not a crash
    assert s3.get_object("nope", "x") is None


def test_edge_checkpoint_roundtrip_through_network_client(rng):
    """The VERDICT r1 'done' bar: edge checkpoints survive through the
    network object-store client — create + ingest + flush on one engine,
    rehydrate a FRESH engine from the same S3 service, search it."""
    from coltt_tpu.engine.edge import EdgeEngine
    from coltt_tpu.index.schema import (
        CollectionSchema, FieldSchema, FieldType,
    )
    from coltt_tpu.ops.quant import Quantization

    srv, addr = start_fake_s3()
    try:
        store = S3ObjectStore(addr)
        eng = EdgeEngine(store, batch_max=1)
        schema = CollectionSchema(
            name="docs", dim=16, quantization=Quantization.F16,
            versioning=True,
            fields=[
                FieldSchema("pk", FieldType.STRING, primary_key=True),
                FieldSchema("lang", FieldType.STRING),
            ],
        )
        eng.create_collection(schema)
        vecs = rng.standard_normal((32, 16)).astype(np.float32)
        eng.index_many(
            "docs",
            [{"pk": f"p{i}", "lang": ["ko", "en"][i % 2]} for i in range(32)],
            vecs,
        )
        eng.flush("docs")

        # a fresh engine on the same service discovers + rehydrates it
        eng2 = EdgeEngine(S3ObjectStore(addr), batch_max=1)
        assert eng2.state.exists("docs")
        eng2.load_collection("docs")
        hits = eng2.search("docs", vecs[7], limit=3)
        assert hits[0].id == "p7"
        assert hits[0].score > 99.0
        assert hits[0].metadata["lang"] == "en"

        # flush twice -> version GC keeps the newest 2 versions
        eng2.flush("docs")
        eng2.flush("docs")
        assert len(store.list_versions("docs", "docs.vertex")) <= 2
    finally:
        srv.shutdown()


def test_s3_put_object_stream_multipart(tmp_path):
    """Streamed PUT > part size goes through multipart (init/parts/
    complete) and reads back byte-identical; small payloads fall back to
    a plain PUT; open_object streams the body back in chunks."""
    from coltt_tpu.storage.s3 import S3ObjectStore
    from tests.fake_s3 import start_fake_s3

    srv, endpoint = start_fake_s3()
    try:
        s3 = S3ObjectStore(endpoint)
        s3.create_bucket("mp")
        # force multipart with a small part size
        s3._PART_SIZE = 1024
        payload = bytes(range(256)) * 40  # 10240 B -> 10 parts
        def writer(f):
            for i in range(0, len(payload), 700):  # odd chunk size
                f.write(payload[i:i + 700])
        s3.put_object_stream("mp", "big.bin", writer)
        assert s3.get_object("mp", "big.bin") == payload
        # streaming read with short reads
        with s3.open_object("mp", "big.bin") as f:
            got = b""
            while True:
                b = f.read(333)
                if not b:
                    break
                got += b
        assert got == payload
        # small payload -> plain PUT fallback
        s3.put_object_stream("mp", "small.bin", lambda f: f.write(b"tiny"))
        assert s3.get_object("mp", "small.bin") == b"tiny"
        assert s3.open_object("mp", "missing.bin") is None
    finally:
        srv.shutdown()


def test_local_put_object_stream_roundtrip(tmp_path):
    from coltt_tpu.storage.objectstore import LocalObjectStore

    store = LocalObjectStore(str(tmp_path / "os"))
    store.create_bucket("b", versioning=True)
    store.put_object_stream("b", "x", lambda f: f.write(b"one"))
    store.put_object_stream("b", "x", lambda f: (f.write(b"tw"), f.write(b"o")))
    assert store.get_object("b", "x") == b"two"
    assert store.list_versions("b", "x") == [1]  # first version retained
    with store.open_object("b", "x") as f:
        assert f.read() == b"two"
    assert store.open_object("b", "nope") is None

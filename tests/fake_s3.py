"""A minimal in-process S3-compatible server for integration tests.

Speaks just enough of the S3 REST dialect (path-style) to exercise
coltt_tpu.storage.s3.S3ObjectStore end to end: bucket CRUD, the
versioning subresource, object PUT/GET/HEAD/DELETE (with versionId),
list-objects-v2 and list-object-versions. Auth headers are accepted but
not verified (the client signs; a fake needn't check).
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple
from xml.sax.saxutils import escape


class _Bucket:
    def __init__(self):
        self.versioning = False
        # name -> list of (version_id, bytes); last element = current
        self.objects: Dict[str, List[Tuple[str, bytes]]] = {}
        self.vseq = 0
        # multipart uploads: upload_id -> (key, {part_number: bytes})
        self.uploads: Dict[str, Tuple[str, Dict[int, bytes]]] = {}
        self.useq = 0


class _State:
    def __init__(self):
        self.buckets: Dict[str, _Bucket] = {}
        self.lock = threading.Lock()


def _xml_response(handler, code: int, body: str) -> None:
    data = body.encode()
    handler.send_response(code)
    handler.send_header("Content-Type", "application/xml")
    handler.send_header("Content-Length", str(len(data)))
    handler.end_headers()
    handler.wfile.write(data)


class _Handler(BaseHTTPRequestHandler):
    state: _State  # set by start_fake_s3

    def log_message(self, *a):  # quiet
        pass

    def _parse(self):
        parsed = urllib.parse.urlsplit(self.path)
        q = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = urllib.parse.unquote(parts[0]) if parts[0] else None
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else None
        return bucket, key, q

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0) or 0)
        return self.rfile.read(n) if n else b""

    def _err(self, code: int, msg: str = "") -> None:
        _xml_response(self, code, f"<Error><Message>{escape(msg)}</Message></Error>")

    # -- verbs -------------------------------------------------------------
    def do_PUT(self):
        bucket, key, q = self._parse()
        body = self._body()
        st = self.state
        with st.lock:
            if key is None:
                if "versioning" in q:
                    b = st.buckets.get(bucket)
                    if b is None:
                        return self._err(404, "NoSuchBucket")
                    b.versioning = b"<Status>Enabled</Status>" in body
                    return _xml_response(self, 200, "")
                if bucket in st.buckets:
                    return self._err(409, "BucketAlreadyOwnedByYou")
                st.buckets[bucket] = _Bucket()
                return _xml_response(self, 200, "")
            b = st.buckets.get(bucket)
            if b is None:
                return self._err(404, "NoSuchBucket")
            if "partNumber" in q and "uploadId" in q:
                up = b.uploads.get(q["uploadId"])
                if up is None or up[0] != key:
                    return self._err(404, "NoSuchUpload")
                up[1][int(q["partNumber"])] = body
                self.send_response(200)
                self.send_header("ETag", f'"part{q["partNumber"]}"')
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            b.vseq += 1
            vid = f"v{b.vseq:06d}"
            versions = b.objects.setdefault(key, [])
            if b.versioning:
                versions.append((vid, body))
            else:
                versions[:] = [("null", body)]
            self.send_response(200)
            self.send_header("ETag", '"fake"')
            self.send_header("x-amz-version-id", vid if b.versioning else "null")
            self.send_header("Content-Length", "0")
            self.end_headers()

    def do_GET(self):
        bucket, key, q = self._parse()
        st = self.state
        with st.lock:
            if bucket is None:
                names = "".join(
                    f"<Bucket><Name>{escape(n)}</Name></Bucket>"
                    for n in sorted(st.buckets)
                )
                return _xml_response(
                    self, 200,
                    "<ListAllMyBucketsResult><Buckets>"
                    f"{names}</Buckets></ListAllMyBucketsResult>",
                )
            b = st.buckets.get(bucket)
            if b is None:
                return self._err(404, "NoSuchBucket")
            if key is None:
                if "versioning" in q:
                    status = "<Status>Enabled</Status>" if b.versioning else ""
                    return _xml_response(
                        self, 200,
                        f"<VersioningConfiguration>{status}"
                        "</VersioningConfiguration>",
                    )
                if "versions" in q:
                    prefix = q.get("prefix", "")
                    rows = []
                    for name, versions in sorted(b.objects.items()):
                        if not name.startswith(prefix):
                            continue
                        for vid, _ in reversed(versions):  # newest first
                            rows.append(
                                f"<Version><Key>{escape(name)}</Key>"
                                f"<VersionId>{vid}</VersionId></Version>"
                            )
                    return _xml_response(
                        self, 200,
                        "<ListVersionsResult>"
                        f"{''.join(rows)}</ListVersionsResult>",
                    )
                # list-objects-v2
                prefix = q.get("prefix", "")
                rows = "".join(
                    f"<Contents><Key>{escape(n)}</Key></Contents>"
                    for n in sorted(b.objects)
                    if b.objects[n] and n.startswith(prefix)
                )
                return _xml_response(
                    self, 200,
                    f"<ListBucketResult>{rows}</ListBucketResult>",
                )
            versions = b.objects.get(key) or []
            if "versionId" in q:
                match = [d for v, d in versions if v == q["versionId"]]
                if not match:
                    return self._err(404, "NoSuchVersion")
                data = match[0]
            elif versions:
                data = versions[-1][1]
            else:
                return self._err(404, "NoSuchKey")
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    def do_HEAD(self):
        bucket, key, _ = self._parse()
        st = self.state
        with st.lock:
            b = st.buckets.get(bucket)
            ok = b is not None and (
                key is None or (b.objects.get(key) or [])
            )
            self.send_response(200 if ok else 404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    def do_POST(self):
        bucket, key, q = self._parse()
        body = self._body()
        st = self.state
        with st.lock:
            b = st.buckets.get(bucket)
            if b is None or key is None:
                return self._err(404, "NoSuchBucket")
            if "uploads" in q:  # CreateMultipartUpload
                b.useq += 1
                uid = f"u{b.useq:06d}"
                b.uploads[uid] = (key, {})
                return _xml_response(
                    self, 200,
                    "<InitiateMultipartUploadResult>"
                    f"<UploadId>{uid}</UploadId>"
                    "</InitiateMultipartUploadResult>",
                )
            if "uploadId" in q:  # CompleteMultipartUpload
                up = b.uploads.pop(q["uploadId"], None)
                if up is None or up[0] != key:
                    return self._err(404, "NoSuchUpload")
                data = b"".join(d for _, d in sorted(up[1].items()))
                b.vseq += 1
                vid = f"v{b.vseq:06d}"
                versions = b.objects.setdefault(key, [])
                if b.versioning:
                    versions.append((vid, data))
                else:
                    versions[:] = [("null", data)]
                return _xml_response(
                    self, 200,
                    "<CompleteMultipartUploadResult>"
                    f"<Key>{escape(key)}</Key>"
                    "</CompleteMultipartUploadResult>",
                )
            return self._err(400, "BadRequest")

    def do_DELETE(self):
        bucket, key, q = self._parse()
        st = self.state
        with st.lock:
            b = st.buckets.get(bucket)
            if b is None:
                return self._err(404, "NoSuchBucket")
            if key is not None and "uploadId" in q:  # AbortMultipartUpload
                b.uploads.pop(q["uploadId"], None)
                self.send_response(204)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if key is None:
                if any(b.objects.values()):
                    return self._err(409, "BucketNotEmpty")
                del st.buckets[bucket]
            elif "versionId" in q:
                versions = b.objects.get(key) or []
                b.objects[key] = [
                    (v, d) for v, d in versions if v != q["versionId"]
                ]
                if not b.objects[key]:
                    b.objects.pop(key, None)
            else:
                b.objects.pop(key, None)
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()


def start_fake_s3() -> Tuple[ThreadingHTTPServer, str]:
    """Start a fake S3 server on an ephemeral port; returns
    ``(server, "127.0.0.1:<port>")``. Call ``server.shutdown()`` to stop."""
    state = _State()
    handler = type("Handler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"127.0.0.1:{srv.server_port}"

"""gRPC search benchmark against a running edge-mode server.

Reference parity: ``benchmark/coltt_edge.go`` / ``compared_edge.go`` —
client-measured search latency distribution over the full RPC path
(marshal -> server -> device scan -> marshal), the number a user actually
sees. The reference's best published figure is 0.02-0.03 s/query on
1M x 128d with highCpu=true (UPDATE-LOG.md:107).

Manual-run integration harness (needs a live server; see README):

    python -m coltt_tpu --config coltt.toml &        # mode = "edge"
    python benchmark/grpc_edge_search.py --n 100000 --queries 500
"""

import argparse
import json
import time

import grpc
import numpy as np

from coltt_tpu.api.client import EdgeClient
from coltt_tpu.index.schema import CollectionSchema, FieldSchema, FieldType
from coltt_tpu.ops.quant import Quantization


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--addr", default="127.0.0.1:50051")
    ap.add_argument("--collection", default="bench_search")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--quantization", default="I8")
    ap.add_argument("--high-resource", action="store_true",
                    help="the reference's highCpu toggle: fused/approx scan")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    client = EdgeClient(grpc.insecure_channel(args.addr))
    try:
        client.delete_collection(args.collection)
    except Exception:
        pass
    schema = CollectionSchema(
        name=args.collection, dim=args.dim,
        quantization=Quantization.parse(args.quantization),
        fields=(FieldSchema(name="pk", type=FieldType.STRING, primary_key=True),
                FieldSchema(name="bucket", type=FieldType.INTEGER)),
    )
    client.create_collection(schema)

    t0 = time.perf_counter()
    batch = 4096
    for base in range(0, args.n, batch):
        m = min(batch, args.n - base)
        vecs = rng.standard_normal((m, args.dim)).astype(np.float32)
        for i in range(m):
            client.index(args.collection, f"p{base + i}", vector=vecs[i],
                         metadata={"pk": f"p{base+i}", "bucket": (base + i) % 16})
    ingest_s = time.perf_counter() - t0
    print(f"ingest {args.n} rows: {ingest_s:.1f}s", flush=True)

    qs = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    client.search(args.collection, qs[0], limit=args.limit,
                  high_resource=args.high_resource)  # warmup/compile
    lats = []
    t0 = time.perf_counter()
    for i in range(args.queries):
        t1 = time.perf_counter()
        client.search(args.collection, qs[i], limit=args.limit,
                      high_resource=args.high_resource)
        lats.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0
    lats_ms = np.asarray(lats) * 1e3
    print(json.dumps({
        "metric": "edge search latency over gRPC (single-query RPCs)",
        "n": args.n, "dim": args.dim,
        "quantization": args.quantization,
        "high_resource": args.high_resource,
        "p50_ms": round(float(np.percentile(lats_ms, 50)), 3),
        "p95_ms": round(float(np.percentile(lats_ms, 95)), 3),
        "p99_ms": round(float(np.percentile(lats_ms, 99)), 3),
        "qps_sequential": round(args.queries / total, 1),
        "reference_p50_ms": "20-30 (1M x 128d, highCpu=true)",
    }), flush=True)


if __name__ == "__main__":
    main()

"""Round benchmark: QPS/chip at recall@10, 1M x 768d, f8 quantized FLAT scan.

BASELINE.json headline config #2. Prints exactly ONE JSON line to stdout:
{"metric": ..., "value": QPS/chip, "unit": "qps", "vs_baseline": x,
 extras...}.

Baseline anchor: the reference's best published FLAT latency is 0.02-0.03 s
per query on 1M x 128d with 16 goroutines (UPDATE-LOG.md:107 / BASELINE.md)
=> ~40 QPS. This bench runs 6x the per-query FLOPs (768d) on one TPU chip;
vs_baseline = our QPS / 40.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from coltt_tpu.ops.distance import Metric
    from coltt_tpu.ops.quant import Quantization
    from coltt_tpu.parallel.dist_search import DistributedFlatIndex
    from coltt_tpu.parallel.mesh import make_mesh

    n, d, k = 1_000_000, 768, 10
    batch = 64
    n_queries = 256

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    # generate on-device: this host's CPU is far too slow for 768M samples
    kv, kq = jax.random.split(jax.random.PRNGKey(0))
    vecs = jax.random.normal(kv, (n, d), jnp.float32)
    queries = np.asarray(jax.random.normal(kq, (n_queries, d), jnp.float32))
    jax.block_until_ready(vecs)
    log(f"data gen (on device): {time.perf_counter()-t0:.1f}s")

    mesh = make_mesh(num_shards=len(jax.devices()), batch=1)
    t0 = time.perf_counter()
    idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                               quantization=Quantization.F8)
    log(f"ingest+quantize 1M x 768 f8: {time.perf_counter()-t0:.1f}s")

    # warmup + compile
    t0 = time.perf_counter()
    idx.search(queries[:batch], k)
    log(f"warmup (compile): {time.perf_counter()-t0:.1f}s")

    # timed runs
    lat = []
    for i in range(0, n_queries, batch):
        t0 = time.perf_counter()
        scores, ids = idx.search(queries[i : i + batch], k)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    qps = batch / np.median(lat)
    p50_per_batch_ms = float(np.median(lat) * 1e3)
    log(f"median batch latency: {p50_per_batch_ms:.2f} ms  QPS: {qps:.0f}")

    # recall@10 vs fp32 ground truth (exact scan on-device, f32)
    gt_idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                                  quantization=Quantization.NONE)
    n_gt = 64
    _, gt_ids = gt_idx.search(queries[:n_gt], k)
    _, f8_ids = idx.search(queries[:n_gt], k)
    recall = float(
        np.mean([len(set(gt_ids[i]) & set(f8_ids[i])) / k for i in range(n_gt)])
    )
    log(f"recall@10 vs fp32: {recall:.3f}")

    baseline_qps = 40.0  # 1/0.025s, reference highCpu FLAT (BASELINE.md)
    print(json.dumps({
        "metric": "FLAT f8 scan QPS/chip at recall@10 (1M x 768d, batch=64)",
        "value": round(float(qps), 1),
        "unit": "qps",
        "vs_baseline": round(float(qps) / baseline_qps, 2),
        "recall_at_10": round(recall, 4),
        "p50_batch_latency_ms": round(p50_per_batch_ms, 3),
        "p50_query_latency_ms": round(p50_per_batch_ms / batch, 4),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()

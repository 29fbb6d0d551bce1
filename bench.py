"""Round benchmark: QPS/chip at recall@10, 1M x 768d, quantized FLAT scan.

BASELINE.json headline config #2, measured as production serving would run:
continuous query batching (pipelined dispatches, results fetched as they
complete). Prints exactly ONE JSON line to stdout.

r04 methodology hardening (VERDICT r3 items 1/2): recall on a DEDICATED
4096-query sample (std ~5e-4; the old 64-query sample's std ~4e-3 was wider
than the differences being decided, and tying the sample to `depth` made
recall jump ~.002 with an unrelated knob), QPS = median of 5 pipelined
rounds after 2 discarded warm rounds (was best-of-3), pipeline depth 16
(measured 144.3k -> 154.3k -> 164.7k QPS at depth 8/12/16), and the
measured selection frontier (FRONTIER_r04.json, bench_frontier.py) rides in
the artifact. The chosen serving config is the best measured point with
recall >= .990: the fused int8 kernel with the single-ApproxTopK selection
and bf16 rerank (oversample 4) — measured 162.8k QPS @ .9919 (driver-style
run; oversample 5 measured recall-identical, so os4 is not the limiter;
slot2 is the collision-free quality option at .9962/131.9k).

Baseline anchor: the reference's best published FLAT latency is 0.02-0.03 s
per query on 1M x 128d with 16 goroutines (UPDATE-LOG.md:107 / BASELINE.md)
=> ~40 QPS. This bench runs 6x the per-query FLOPs (768d) on one TPU chip;
vs_baseline = our QPS / 40.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: the 1M-row scan compiles in ~10 min cold on
    # the remote-compile relay; cached it loads in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from coltt_tpu.ops.distance import Metric
    from coltt_tpu.ops.quant import Quantization
    from coltt_tpu.ops.topk import compute_recall
    from coltt_tpu.parallel.dist_search import (
        DistributedFlatIndex, sharded_scan_topk,
    )
    from coltt_tpu.parallel.mesh import BATCH_AXIS, make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, k = 1_000_000, 768, 10
    batch = 2048  # MXU utilization rises with Q (89k->114k QPS bf16-matmul-only
    # from Q=512->2048 measured on v5e); the int8 MXU path adds another 2x
    depth = 16    # pipelined dispatches per measurement (r04 sweep: 144.3k
    # QPS at depth 8 -> 154.3k at 12 -> 164.7k at 16 — more in-flight
    # batches hide the relay round trips)
    final = "approx"
    recall_q = 4096  # dedicated query sample, independent of `depth` (the
    # r04 sweep showed per-depth recall spread ~.002 was purely which
    # split(kq, depth+1) tail served as the recall set); two 2048-query
    # searches reuse the timing batches' compiled shape

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    kv, kq = jax.random.split(jax.random.PRNGKey(0))
    vecs = jax.random.normal(kv, (n, d), jnp.float32)
    jax.block_until_ready(vecs)
    log(f"data gen (on device): {time.perf_counter()-t0:.1f}s")

    mesh = make_mesh(num_shards=len(jax.devices()), batch=1)
    qspec = NamedSharding(mesh, P(BATCH_AXIS))
    t0 = time.perf_counter()
    idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                               quantization=Quantization.I8,
                               rerank_dtype=jnp.bfloat16)
    log(f"ingest+quantize 1M x 768 i8 (+bf16 rerank copy): {time.perf_counter()-t0:.1f}s")

    # serving scan: the Pallas fused kernel (ops/scan_pallas.py) — int8 MXU
    # matmul (2x the bf16 rate), in-VMEM bin selection (one packed survivor
    # per 32 rows, no [Q, N] HBM materialization), the single-ApproxTopK
    # selection over the survivors, then a bf16 rerank of the k*4 shortlist
    # (storage error, not selection, is the recall ceiling; the selection
    # alternatives are measured in FRONTIER_r04.json).
    def dispatch(q_dev):
        return sharded_scan_topk(
            mesh, idx.codes, idx.scale, idx.sqnorm, idx.valid, q_dev,
            k=k, metric=idx.metric, compute_dtype=idx.compute_dtype,
            fused=True, final=final,
            rr_codes=idx.rr_codes, oversample=4,
        )

    qkeys = jax.random.split(kq, depth)
    q_batches = [
        jax.device_put(jax.random.normal(qk, (batch, d), jnp.float32), qspec)
        for qk in qkeys
    ]
    jax.block_until_ready(q_batches)

    # warmup / compile (cold: ~10-12 min behind the relay; warm via the
    # persistent cache: seconds — both recorded in the artifact)
    t0 = time.perf_counter()
    np.asarray(dispatch(q_batches[0])[0])
    warmup_s = time.perf_counter() - t0
    log(f"warmup (compile): {warmup_s:.1f}s")

    # p50 latency: synchronous single batches
    lats = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(dispatch(q_batches[i % depth])[0])
        lats.append(time.perf_counter() - t0)
    p50_batch_ms = float(np.median(lats) * 1e3)

    # throughput: pipelined (continuous query batching), median of 5 rounds
    # after 2 discarded warm rounds. Dispatches queue on the device
    # back-to-back; results are fetched on a thread pool so the per-fetch
    # relay round-trip overlaps with compute instead of serializing.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(depth)
    qps_rounds = []
    for r in range(7):
        t0 = time.perf_counter()
        outs = [dispatch(q_batches[i]) for i in range(depth)]
        futs = [pool.submit(lambda o=o: np.asarray(o[0])) for o in outs]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
        if r >= 2:
            qps_rounds.append(depth * batch / dt)
    qps = float(np.median(qps_rounds))
    log(f"p50 sync batch latency: {p50_batch_ms:.2f} ms; pipelined QPS "
        f"median-of-5: {qps:.0f} (rounds {[round(x) for x in qps_rounds]})")

    # recall@10 vs fp32 ground truth (exact scan on-device, f32) on a
    # dedicated 4096-query sample (two 2048-query searches — the same
    # compiled serving shape as the timing batches)
    gt_idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                                  quantization=Quantization.NONE)
    rkey = jax.random.fold_in(kq, 0x5eca11)
    gq = np.asarray(jax.device_get(
        jax.random.normal(rkey, (recall_q, d), jnp.float32)
    ))
    got, truth = [], []
    for i in range(0, recall_q, batch):
        _, gt_ids = gt_idx.search(gq[i:i + batch], k)
        _, i8_ids = idx.search(gq[i:i + batch], k, fused=True,
                               oversample=4, final=final)
        truth.append(gt_ids)
        got.append(i8_ids)
    recall = float(compute_recall(np.concatenate(got), np.concatenate(truth)))
    log(f"recall@10 vs fp32 ({recall_q} queries): {recall:.4f}")

    frontier = None
    fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "FRONTIER_r04.json")
    if os.path.exists(fp):
        try:
            with open(fp) as fh:
                frontier = json.load(fh).get("finals")
        except (OSError, ValueError):
            frontier = None

    baseline_qps = 40.0  # 1/0.025s, reference highCpu FLAT (BASELINE.md)
    print(json.dumps({
        "metric": "FLAT fused-i8+bf16-rerank QPS/chip at recall@10 "
                  "(1M x 768d, batch=2048, pipelined depth=16, "
                  "median-of-5)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / baseline_qps, 2),
        "recall_at_10": round(recall, 4),
        "recall_queries": recall_q,
        "qps_rounds": [round(x, 1) for x in qps_rounds],
        "p50_batch_latency_ms": round(p50_batch_ms, 3),
        "p50_query_latency_ms": round(p50_batch_ms / batch, 4),
        "warmup_s": round(warmup_s, 1),
        "final": final,
        "devices": len(jax.devices()),
        "selection_frontier": frontier,
    }))


if __name__ == "__main__":
    main()

"""BASELINE config #4: PQ codebook search, 10M x 768d, continuous batching.

The corpus never exists in fp32 anywhere at once: it is generated on device
in 1M-row chunks; each chunk is (a) scored exactly in f32 against the eval
queries to maintain a running ground-truth top-k, (b) PQ-encoded into the
authoritative [N, M] uint8 codes, (c) folded into the f8 scan cache (the
production PQ serving representation, store/flat.py PQ mode). Device state
is preallocated and slice-updated with donation, so peak HBM stays
codes (0.96 GB) + f8 cache (7.7 GB) + one transient f32 chunk (3 GB).

Prints ONE JSON line (same shape as bench.py; this is a secondary bench —
the driver's headline bench stays bench.py).

Run manually on the TPU:  timeout 3600 python -u bench_pq.py
"""

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from coltt_tpu.ops.distance import Metric, scan_distances
    from coltt_tpu.ops.pq import (
        PQCodebook, default_subspaces, pq_encode, pq_scan_neg_topk,
        pq_sqnorm, train_pq,
    )
    from coltt_tpu.ops.quant import Quantization, dequantize, quantize
    from coltt_tpu.ops.topk import merge_topk, scan_neg_topk

    # 10 x 2^20 rows: block-aligned for the auto-blocked scan (stores allocate
    # in 8192-row quanta; the bench mirrors that)
    n_total, d, k = 10 * (1 << 20), 768, 10
    chunk_n = 1 << 20
    batch = 512
    depth = 8
    n_eval = 64
    m = default_subspaces(d)  # 96 subspaces x 8 dims

    log(f"devices: {jax.devices()}  M={m}")
    key = jax.random.PRNGKey(0)
    kq, key = jax.random.split(key)
    eval_q = jax.random.normal(kq, (n_eval, d), jnp.float32)

    @jax.jit
    def exact_chunk_topk(q, chunk):
        sqn = jnp.sum(chunk * chunk, axis=1)
        dist = scan_distances(q, chunk, None, sqnorm=sqn, valid=None,
                              metric=Metric.COSINE, compute_dtype=jnp.float32)
        return lax.top_k(-dist, k)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def fold_chunk(pq_codes, f8_codes, f8_scale, f8_sqn, chunk, centroids, off):
        c8, s8 = quantize(chunk, Quantization.F8)
        deq = dequantize(c8, s8)
        q8 = jnp.sum(deq * deq, axis=1)
        pqc, _ = pq_encode(chunk, PQCodebook(centroids))
        return (
            lax.dynamic_update_slice_in_dim(pq_codes, pqc, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_codes, c8, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_scale, s8, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_sqn, q8, off, axis=0),
        )

    pq_codes = jnp.zeros((n_total, m), jnp.uint8)
    f8_codes = jnp.zeros((n_total, d), jnp.float8_e4m3fn)
    f8_scale = jnp.zeros((n_total, 1), jnp.float32)
    f8_sqn = jnp.zeros((n_total,), jnp.float32)
    gt_neg = gt_ids = None
    codebook = None
    t_ingest0 = time.perf_counter()
    n_chunks = n_total // chunk_n
    for ci in range(n_chunks):
        kc, key = jax.random.split(key)
        chunk = jax.random.normal(kc, (chunk_n, d), jnp.float32)
        if codebook is None:
            t0 = time.perf_counter()
            codebook = train_pq(chunk[:262144], m=m, iters=12)
            jax.block_until_ready(codebook.centroids)
            log(f"PQ train (64k sample, 12 iters): {time.perf_counter()-t0:.1f}s")
        # exact fp32 ground truth, merged incrementally before the chunk dies
        neg, ids = exact_chunk_topk(eval_q, chunk)
        ids = ids + ci * chunk_n
        if gt_neg is None:
            gt_neg, gt_ids = neg, ids
        else:
            gt_neg, gt_ids = merge_topk(gt_neg, gt_ids, neg, ids, k=k)
        pq_codes, f8_codes, f8_scale, f8_sqn = fold_chunk(
            pq_codes, f8_codes, f8_scale, f8_sqn, chunk,
            codebook.centroids, ci * chunk_n,
        )
        del chunk
        np.asarray(gt_neg[0, 0])  # sync point (fetch forces completion)
        log(f"chunk {ci+1}/{n_chunks} ingested "
            f"({time.perf_counter()-t_ingest0:.0f}s elapsed)")

    valid = jnp.ones(n_total, bool)
    log(f"ingest total (gen+train+encode+cache+GT): "
        f"{time.perf_counter()-t_ingest0:.1f}s")
    gt = np.asarray(gt_ids)

    pq_sqn = pq_sqnorm(pq_codes, codebook)

    # -- serving dispatches ----------------------------------------------------
    def dispatch_cache(q):
        # production PQ serving path: f8 scan cache + ApproxTopK
        return scan_neg_topk(q, f8_codes, f8_scale, f8_sqn, valid,
                             k=k, metric=Metric.COSINE, approx_recall=0.99)

    def dispatch_adc(q):
        # low-memory path: ADC over the uint8 codes only
        return pq_scan_neg_topk(q, pq_codes, codebook.centroids, pq_sqn, valid,
                                k=k, metric=Metric.COSINE)

    kq2, key = jax.random.split(key)
    q_batches = [
        jax.random.normal(jax.random.fold_in(kq2, i), (batch, d), jnp.float32)
        for i in range(depth)
    ]
    np.asarray(q_batches[-1][0, 0])

    results = {}
    for name, fn in [("f8cache", dispatch_cache), ("adc", dispatch_adc)]:
        t0 = time.perf_counter()
        np.asarray(fn(q_batches[0])[0])
        log(f"{name} warmup (compile): {time.perf_counter()-t0:.1f}s")
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(q_batches[i]) for i in range(depth)]
            total = sum(o[0].sum() for o in outs)  # one fetch syncs all
            np.asarray(total)
            dt = time.perf_counter() - t0
            best = max(best, depth * batch / dt)
        _, ids = fn(eval_q)
        ids = np.asarray(ids)
        rec = float(np.mean(
            [len(set(gt[i]) & set(ids[i])) / k for i in range(n_eval)]
        ))
        log(f"{name}: {best:.0f} QPS, recall@10 vs fp32 {rec:.3f}")
        results[name] = (best, rec)

    qps, rec = results["f8cache"]
    print(json.dumps({
        "metric": "PQ(M=96)+f8-cache QPS/chip at recall@10 (10M x 768d, batch=512)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": None,
        "recall_at_10": round(rec, 4),
        "adc_qps": round(results["adc"][0], 1),
        "adc_recall_at_10": round(results["adc"][1], 4),
        "devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()

"""Selection-frontier bench: QPS + recall@10 per `final` mode, one process.

Measures the fused-scan selection variants (ops/scan_pallas.py: slot2 /
approx / approx2 / exact) end-to-end on the flagship config (1M x 768d,
i8 fused scan + bf16 rerank, Q=2048 pipelined) with the hardened
methodology VERDICT r03 demanded: recall on 2048 queries (std ~7e-4 at
p~0.99 vs 64-query std ~4e-3) and median-of-5 pipelined rounds (vs
best-of-3). Writes FRONTIER_r04.json; bench.py embeds it in the round
artifact so the judge sees the frontier behind the chosen default.

Run: python bench_frontier.py [final ...]   (default: all four modes)
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


FINALS = ("slot2", "slot2t", "slot2c", "slot2a", "approx", "approx2", "exact")


def main():
    finals = [f for f in sys.argv[1:] if f in FINALS] or list(FINALS)
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
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
    batch = 2048
    depth = int(os.environ.get("BENCH_DEPTH", "8"))
    oversample = int(os.environ.get("BENCH_OVERSAMPLE", "4"))
    recall_q = 2048  # same compiled shape as the timing batches

    log(f"devices: {jax.devices()}")
    kv, kq = jax.random.split(jax.random.PRNGKey(0))
    vecs = jax.random.normal(kv, (n, d), jnp.float32)
    jax.block_until_ready(vecs)

    mesh = make_mesh(num_shards=len(jax.devices()), batch=1)
    qspec = NamedSharding(mesh, P(BATCH_AXIS))
    idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                               quantization=Quantization.I8,
                               rerank_dtype=jnp.bfloat16)
    gt_idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                                  quantization=Quantization.NONE)
    del vecs

    qkeys = jax.random.split(kq, depth + 1)
    q_batches = [
        jax.device_put(jax.random.normal(qk, (batch, d), jnp.float32), qspec)
        for qk in qkeys
    ]
    jax.block_until_ready(q_batches)
    gq = np.asarray(jax.device_get(q_batches[depth]))[:recall_q]
    t0 = time.perf_counter()
    _, gt_ids = gt_idx.search(gq, k)
    log(f"ground truth ({recall_q} queries): {time.perf_counter()-t0:.1f}s")

    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(depth)
    results = {}
    if os.path.exists("FRONTIER_r04.json"):  # merge partial sweeps
        try:
            with open("FRONTIER_r04.json") as fh:
                results = json.load(fh).get("finals", {})
        except (OSError, ValueError):
            results = {}
    for final in finals:
        def dispatch(q_dev, final=final):
            return sharded_scan_topk(
                mesh, idx.codes, idx.scale, idx.sqnorm, idx.valid, q_dev,
                k=k, metric=idx.metric, compute_dtype=idx.compute_dtype,
                fused=True, rr_codes=idx.rr_codes, oversample=oversample,
                final=final,
            )

        t0 = time.perf_counter()
        np.asarray(dispatch(q_batches[0])[0])
        warm = time.perf_counter() - t0
        log(f"[{final}] warmup (compile): {warm:.1f}s")

        # 2 discarded warm rounds, then median of 5 pipelined rounds
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

        _, got_ids = idx.search(gq, k, fused=True, oversample=oversample,
                                final=final)
        recall = compute_recall(got_ids, gt_ids)
        log(f"[{final}] QPS median={qps:.0f} rounds="
            f"{[round(x) for x in qps_rounds]} recall@10={recall:.4f}")
        key = final if depth == 8 else f"{final}@depth{depth}"
        if oversample != 4:
            key += f"@os{oversample}"
        results[key] = {
            "qps_median5": round(qps, 1),
            "qps_rounds": [round(x, 1) for x in qps_rounds],
            "recall_at_10": round(float(recall), 4),
            "recall_queries": recall_q,
            "warmup_s": round(warm, 1),
        }
        with open("FRONTIER_r04.json", "w") as fh:
            json.dump({
                "config": "FLAT fused-i8+bf16-rerank, 1M x 768d, Q=2048 "
                          "pipelined, one v5e chip; keys are the selection "
                          "final, suffixed @depthN/@osN when not the "
                          "default depth 8 / oversample 4",
                "methodology": "median of 5 pipelined rounds after 2 warm "
                               "rounds; recall@10 on 2048 queries vs exact "
                               "f32 scan",
                "finals": results,
            }, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

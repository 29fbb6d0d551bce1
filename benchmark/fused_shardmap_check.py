"""Fused Pallas kernel x shard_map equivalence ON HARDWARE (VERDICT r4 #5).

Every multi-device test runs on the virtual CPU mesh, where the fused
kernel falls back to XLA; on the real chip the serving benches use a
1-device mesh, which bypasses shard_map entirely. This script closes the
gap: it runs the EXACT flagship scan (fused int8 kernel + bf16 rerank)
twice on the real TPU — direct (bypass) and wrapped in shard_map over a
1-device mesh (bypass_single=False) — asserts score/id equality, and
measures the shard_map wrapper's cost.

Usage: python benchmark/fused_shardmap_check.py [N] [D]
Prints one JSON line: {"equal": bool, "overhead_pct": float, ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coltt_tpu.ops.distance import Metric
    from coltt_tpu.ops.quant import Quantization
    from coltt_tpu.parallel.dist_search import (
        DistributedFlatIndex, sharded_scan_topk,
    )
    from coltt_tpu.parallel.mesh import BATCH_AXIS, make_mesh

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    k, batch, depth = 10, 2048, 8

    log(f"devices: {jax.devices()}")
    kv, kq = jax.random.split(jax.random.PRNGKey(0))
    vecs = jax.random.normal(kv, (n, d), jnp.float32)
    mesh = make_mesh(num_shards=1, batch=1, devices=jax.devices()[:1])
    idx = DistributedFlatIndex(mesh, vecs, metric=Metric.COSINE,
                               quantization=Quantization.I8,
                               rerank_dtype=jnp.bfloat16)
    qspec = NamedSharding(mesh, P(BATCH_AXIS))
    q_batches = [
        jax.device_put(jax.random.normal(qk, (batch, d), jnp.float32), qspec)
        for qk in jax.random.split(kq, depth)
    ]
    jax.block_until_ready(q_batches)

    def dispatch(q_dev, bypass):
        return sharded_scan_topk(
            mesh, idx.codes, idx.scale, idx.sqnorm, idx.valid, q_dev,
            k=k, metric=idx.metric, compute_dtype=idx.compute_dtype,
            fused=True, final="approx", rr_codes=idx.rr_codes, oversample=4,
            bypass_single=bypass,
        )

    # compile both shapes
    for bypass in (True, False):
        t0 = time.perf_counter()
        np.asarray(dispatch(q_batches[0], bypass)[0])
        log(f"warmup bypass={bypass}: {time.perf_counter()-t0:.1f}s")

    # equality: the 1-shard shard_map wrapping must not change a single
    # result bit (all_gather over a 1-axis is a no-op, axis_index is 0)
    equal = True
    max_dscore = 0.0
    for q in q_batches[:4]:
        s1, i1 = (np.asarray(x) for x in dispatch(q, True))
        s2, i2 = (np.asarray(x) for x in dispatch(q, False))
        if not np.array_equal(i1, i2):
            equal = False
            log(f"id mismatch: {np.mean(i1 != i2)*100:.3f}% of entries")
        max_dscore = max(max_dscore, float(np.max(np.abs(s1 - s2))))
    log(f"ids equal: {equal}; max |score delta|: {max_dscore:.2e}")

    # cost: pipelined rounds each way, median of 5 after 2 warm; fetches
    # overlap on a thread pool (a serial np.asarray loop is ~28 ms relay
    # RTT per fetch and masks the scan cost entirely — bench.py shape)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(depth)

    def rounds(bypass):
        out = []
        for r in range(7):
            t0 = time.perf_counter()
            outs = [dispatch(q_batches[i], bypass) for i in range(depth)]
            futs = [pool.submit(lambda o=o: np.asarray(o[0])) for o in outs]
            for f in futs:
                f.result()
            dt = time.perf_counter() - t0
            if r >= 2:
                out.append(depth * batch / dt)
        return float(np.median(out))

    qps_direct = rounds(True)
    qps_sm = rounds(False)
    overhead_pct = (qps_direct / qps_sm - 1.0) * 100.0
    log(f"QPS direct {qps_direct:.0f} vs shard_map-wrapped {qps_sm:.0f} "
        f"({overhead_pct:+.2f}% overhead)")

    print(json.dumps({
        "check": "fused kernel x shard_map (1-device mesh) on hardware",
        "n": n, "dim": d, "batch": batch,
        "ids_equal": bool(equal),
        "max_score_delta": max_dscore,
        "qps_direct": round(qps_direct, 1),
        "qps_shard_map": round(qps_sm, 1),
        "overhead_pct": round(overhead_pct, 2),
    }))


if __name__ == "__main__":
    main()

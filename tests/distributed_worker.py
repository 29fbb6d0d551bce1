"""Worker process for the 2-process distributed integration test.

Run by tests/test_distributed.py as a subprocess:

    python tests/distributed_worker.py <coordinator> <num_procs> <proc_id>

Each process owns 4 virtual CPU devices (8 global across the 2 processes),
initializes the multi-controller runtime against a localhost coordinator
(gloo CPU collectives), builds the host-major multihost mesh, ingests only
ITS OWN block of the corpus via assemble_global_rows, then runs a sharded
top-k scan whose collective merge crosses the process boundary — and
checks the result against a local numpy exact scan (both processes can
afford the full corpus host-side; it is regenerated from the shared seed).
"""

import sys

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def main() -> None:
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    from coltt_tpu.parallel.multihost import (
        assemble_global_rows,
        host_row_range,
        init_distributed,
        make_multihost_mesh,
    )

    nprocs = init_distributed(
        coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert nprocs == num_procs, f"process_count {nprocs} != {num_procs}"
    assert len(jax.devices()) == 4 * num_procs
    assert len(jax.local_devices()) == 4

    from coltt_tpu.ops.distance import Metric
    from coltt_tpu.parallel.dist_search import sharded_scan_topk
    from coltt_tpu.parallel.mesh import SHARD_AXIS

    mesh = make_multihost_mesh(batch=1)
    assert mesh.shape[SHARD_AXIS] == 4 * num_procs

    n, d, q, k = 1024, 64, 8, 10
    rng = np.random.default_rng(7)  # same corpus on every process
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    start, end = host_row_range(n, mesh)
    assert end - start == n // num_procs, (start, end)
    # process-spanning ingest: each host contributes ONLY its own rows
    codes = assemble_global_rows(mesh, vecs[start:end], n)
    sqnorm = assemble_global_rows(
        mesh, np.sum(vecs[start:end] ** 2, axis=1), n
    )
    valid = assemble_global_rows(mesh, np.ones(end - start, bool), n)

    scores, ids = sharded_scan_topk(
        mesh, codes, None, sqnorm, valid,
        jax.device_put(queries), k=k, metric=Metric.COSINE,
    )
    scores = np.asarray(jax.device_get(scores))
    ids = np.asarray(jax.device_get(ids))

    # exact reference on host
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = qn @ vn.T
    ref_ids = np.argsort(-sim, axis=1)[:, :k]
    for r in range(q):
        got, want = set(ids[r].tolist()), set(ref_ids[r].tolist())
        assert got == want, f"row {r}: {sorted(got)} != {sorted(want)}"
        # 0-100 cosine score of the top hit matches the exact value
        top = ((2.0 - (1.0 - sim[r, ref_ids[r, 0]])) / 2.0) * 100.0
        assert abs(scores[r, 0] - top) < 0.15, (scores[r, 0], top)

    # -- PQ leg (VERDICT r4 #7): train an identical codebook on each
    # process (same data + same deterministic ops), encode ONLY the local
    # rows, assemble across the process boundary, sharded ADC scan.
    import jax.numpy as jnp

    from coltt_tpu.ops.pq import pq_encode, pq_scan_neg_topk, train_pq
    from coltt_tpu.parallel.dist_search import (
        sharded_cflat_topk, sharded_pq_topk,
    )

    cb = train_pq(jnp.asarray(vecs), m=8, n_centroids=32, iters=4,
                  sample_size=n)
    local_codes, local_sqn = pq_encode(jnp.asarray(vecs[start:end]), cb)
    pq_codes = assemble_global_rows(mesh, np.asarray(local_codes), n)
    pq_sqn = assemble_global_rows(mesh, np.asarray(local_sqn), n)
    ps, pi = sharded_pq_topk(
        mesh, pq_codes, cb.centroids, pq_sqn, valid,
        jax.device_put(queries), k=k, metric=Metric.COSINE,
        rotation=cb.rotation, coarse=cb.coarse,
    )
    ps = np.asarray(jax.device_get(ps))
    # reference: the same ADC scan unsharded on this process (full corpus)
    full_codes, full_sqn = pq_encode(jnp.asarray(vecs), cb)
    rneg, _ = pq_scan_neg_topk(
        jnp.asarray(queries), full_codes, cb.centroids, full_sqn,
        jnp.ones(n, bool), k=k, metric=Metric.COSINE,
        rotation=cb.rotation, coarse=cb.coarse,
    )
    from coltt_tpu.ops.score import normalize_score
    ref_scores = np.asarray(jax.device_get(
        normalize_score(-rneg, Metric.COSINE)))
    # same score profile per row (ids may tie-swap across shards)
    np.testing.assert_allclose(np.sort(ps, axis=1),
                               np.sort(ref_scores, axis=1), atol=1e-3)

    # -- CFLAT leg: two named vector fields, weighted-sum scoring across
    # the process boundary.
    d2 = d // 2
    vecs2 = rng.standard_normal((n, d2)).astype(np.float32)  # same on both
    q2 = rng.standard_normal((q, d2)).astype(np.float32)
    f1 = (
        assemble_global_rows(mesh, vecs[start:end], n),
        None,
        sqnorm,
    )
    f2 = (
        assemble_global_rows(mesh, vecs2[start:end], n),
        None,
        assemble_global_rows(mesh, np.sum(vecs2[start:end] ** 2, axis=1), n),
    )
    cs, ci = sharded_cflat_topk(
        mesh, (f1, f2), valid,
        (jax.device_put(queries), jax.device_put(q2)),
        (jnp.float32(0.7), jnp.float32(0.3)), k=k, metric=Metric.COSINE,
        compute_dtype=jnp.float32,
    )
    cs = np.asarray(jax.device_get(cs))
    ci = np.asarray(jax.device_get(ci))
    # host reference for the weighted sum (f64 — near-tie candidates at
    # the top-k boundary may legitimately swap vs the device's f32 sum,
    # so compare score profiles and require strong id overlap, not set
    # equality)
    q2n = q2 / np.linalg.norm(q2, axis=1, keepdims=True)
    v2n = vecs2 / np.linalg.norm(vecs2, axis=1, keepdims=True)
    sim2 = q2n @ v2n.T
    total = (((2.0 - (1.0 - sim)) / 2.0) * 100.0 * 0.7
             + ((2.0 - (1.0 - sim2)) / 2.0) * 100.0 * 0.3)
    ref_c = np.argsort(-total, axis=1)[:, :k]
    ref_top = np.sort(total, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(cs, ref_top, atol=0.02)
    for r in range(q):
        overlap = len(set(ci[r].tolist()) & set(ref_c[r].tolist()))
        assert overlap >= k - 1, (r, overlap)
        assert ci[r, 0] == ref_c[r, 0], r

    print(f"OK-{proc_id}", flush=True)


if __name__ == "__main__":
    main()

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

    print(f"OK-{proc_id}", flush=True)


if __name__ == "__main__":
    main()

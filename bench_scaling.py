"""Multi-device scaling measurement (VERDICT r2 item 8).

No multi-chip hardware exists in this environment (one TPU behind a
tunnel), so this measures what CAN be measured and models what cannot:

1. **CPU-mesh proxy** (8 virtual devices via
   ``xla_force_host_platform_device_count``): the same corpus scanned by
   ``sharded_scan_topk`` on meshes of 1/2/4/8 shards — fixed TOTAL work,
   so perfect scaling keeps wall time flat while per-device rows drop 8x.
   This exercises the real shard_map + all_gather + merge code path and
   prices the collective layer; it is a *proxy* (CPU cores, DCN-free).
2. **Analytic ICI model** for the real topology: the collective moves
   [Q, k] partials per device per batch — bytes — against a scan that
   moves the corpus shard through the MXU. Efficiency = scan / (scan +
   merge) with published v5e ICI bandwidth (~45 GB/s/link each way).

Writes BENCH_scaling.json and prints its one-line JSON to stdout.
Run:  python bench_scaling.py   (re-execs itself with the CPU-mesh env).
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # the environment pins JAX_PLATFORMS=axon via sitecustomize before user
    # code runs, so env vars are overridden — force CPU via jax.config
    # (same trick as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coltt_tpu.ops.distance import Metric
    from coltt_tpu.parallel.dist_search import sharded_scan_topk
    from coltt_tpu.parallel.mesh import BATCH_AXIS, make_mesh

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    n, d, q, k = 262_144, 256, 256, 10
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    sqn = (vecs * vecs).sum(1)

    # r04's artifact was non-monotone (2 shards measured 20% FASTER than
    # 1 at fixed total work) on best-of-5 — on a CPU proxy all "devices"
    # share one thread pool, so run-to-run scheduler drift dominates small
    # deltas. r05 hardening: interleave the shard configs round-robin
    # (cancels slow host drift), 3 warm + 15 timed passes per config,
    # median per config.
    runners = {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(num_shards=shards, batch=1,
                         devices=jax.devices()[:shards])
        spec = NamedSharding(mesh, P("shard"))
        qspec = NamedSharding(mesh, P(BATCH_AXIS))
        jv = jax.device_put(jnp.asarray(vecs), spec)
        js = jax.device_put(jnp.asarray(sqn), spec)
        jval = jax.device_put(jnp.ones((n,), bool), spec)
        jq = jax.device_put(jnp.asarray(queries), qspec)

        def run(mesh=mesh, jv=jv, js=js, jval=jval, jq=jq):
            s, i = sharded_scan_topk(
                mesh, jv, None, js, jval, jq, k=k,
                metric=Metric.COSINE, compute_dtype=jnp.float32,
            )
            jax.block_until_ready((s, i))
            return s, i

        runners[shards] = run

    samples = {s: [] for s in runners}
    for it in range(18):  # 3 warm + 15 timed, interleaved
        for shards, run in runners.items():
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            if it >= 3:
                samples[shards].append(dt)
    rows = {s: float(np.median(v)) for s, v in samples.items()}
    spread = {s: round(float(np.std(v) / np.median(v)), 3)
              for s, v in samples.items()}
    for shards in rows:
        log(f"shards={shards}: {rows[shards]*1e3:.1f} ms median-of-15 "
            f"(rel std {spread[shards]}, {q/rows[shards]:.0f} QPS, "
            "fixed total work)")

    # fixed total work: ideal scaling keeps time flat as shards grow
    base = rows[1]
    ratios = {s: round(rows[s] / base, 3) for s in rows}

    # analytic ICI model (v5e): per batch of Q=2048, each device ships
    # [Q, 2k] f32+i32 partials (all_gather) ~= 2048*20*8 B = 320 KB over
    # ~45 GB/s ICI ~= 7 us/hop; the 1M-row/8 int8 scan per device is ~1.8
    # ms (measured 14 ms at 1M single-chip). Efficiency = t_scan/(t_scan+
    # t_merge).
    q_serve, k_serve = 2048, 10
    bytes_per_dev = q_serve * 2 * k_serve * 8
    ici_bw = 45e9
    t_merge = bytes_per_dev / ici_bw * 2  # gather + broadcast legs
    t_scan_8 = 14e-3 / 8
    eff = t_scan_8 / (t_scan_8 + t_merge)

    out = {
        "metric": "sharded-scan scaling (8-virtual-device CPU mesh proxy, "
                  "fixed total work 262k x 256d)",
        "value": ratios[8],
        "unit": "t_8shards / t_1shard (1.0 = perfect)",
        "vs_baseline": None,
        "ratios": ratios,
        "wall_ms": {s: round(rows[s] * 1e3, 2) for s in rows},
        "rel_std": spread,
        "methodology": "interleaved round-robin, 3 warm + 15 timed passes "
                       "per config, median (r04's best-of-5 was "
                       "non-monotone from host scheduler drift)",
        "ici_model": {
            "assumption": "v5e ICI ~45 GB/s/link; [Q,k] partials per device",
            "t_merge_us": round(t_merge * 1e6, 1),
            "t_scan_per_dev_ms_1M_over_8": round(t_scan_8 * 1e3, 3),
            "predicted_efficiency": round(eff, 4),
        },
        "note": "one real chip in this env; CPU mesh exercises the real "
                "shard_map+all_gather path, ICI numbers are modeled",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("_COLTT_SCALING_CHILD") != "1":
        env = dict(os.environ)
        env["_COLTT_SCALING_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
    main()

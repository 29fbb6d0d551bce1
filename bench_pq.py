"""BASELINE config #4: PQ codebook search, 10M x 768d, continuous batching.

Corpus: embedding-like structure — a 16k-center cluster mixture with a
per-dim spectrum decay (i^-0.5). On pure i.i.d. gaussians PQ recall is
meaningless for ANY implementation (distance concentration: measured
recall@10 ~0.10 at 10M; the reference never measured PQ recall at all and
later removed its PQ), while structured data is both realistic and what
OPQ is built for: measured at 262k x 128d, plain PQ 0.32 -> OPQ 0.62
(os=1), 0.83 -> 0.98 (os=4 + bf16 rerank).

The corpus never exists in fp32 anywhere at once: it is generated on
device in 1M-row chunks; each chunk is (a) scored exactly in f32 against
the eval queries to maintain a running ground-truth top-k, (b) OPQ+PQ-
encoded into the authoritative [N, M] uint8 codes, (c) folded into the f8
scan cache built from the PQ RECONSTRUCTION — exactly what store/flat.py
PQ mode serves (the cache is rebuildable state; the durable footprint is
the codes at 1/8 byte-per-dim). Peak HBM stays codes (0.96 GB) + f8 cache
(7.7 GB) + one transient f32 chunk (3 GB).

Two serving paths are measured, both recall-capped by PQ reconstruction
quality (there is no full-precision copy in PQ mode — that is the point):
- f8cache: fused scan over the f8 reconstruction cache (production path)
- adc: blockwise decompress-at-search over the uint8 codes only
  (low-memory fallback; gather-bound, documented in ops/pq.py)

Prints ONE JSON line (same shape as bench.py; this is a secondary bench —
the driver's headline bench stays bench.py). Baseline anchor: the
reference's PQ era published "<14 ms @ 50k rows" (UPDATE-LOG.md:193) =
~71 QPS on a corpus 200x smaller.

Run manually on the TPU:  timeout 5400 python -u bench_pq.py
"""

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _serve_phase(path, *, batch, depth, k, n_eval, m, coarse_c):
    """Fresh-process serving: load the snapshot (codes -> device + f8
    cache rebuild, timed), then measure QPS/recall through the production
    FlatStore.search path. See the --save-to/--serve-from note in main."""
    import os

    import jax
    import numpy as np

    from coltt_tpu.store.flat import FlatStore

    log(f"devices: {jax.devices()}  (serve phase, M={m} coarse={coarse_c})")
    aux = np.load(path + ".aux.npz")
    gt = aux["gt"]
    eval_q = aux["eval_q"]
    q_batches = [aux["q_batches"][i] for i in range(aux["q_batches"].shape[0])]

    t0 = time.perf_counter()
    with open(path, "rb") as f:
        store = FlatStore.load(f)
    np.asarray(jax.device_get(store.sqnorm[:1]))
    load_s = time.perf_counter() - t0
    log(f"load (read {os.path.getsize(path)/1e9:.2f} GB codes + rebuild "
        f"f8 cache): {load_s:.1f}s")

    def search(q):
        return store.search(q, k, oversample=4, approx_recall=0.99)

    t0 = time.perf_counter()
    search(q_batches[0])
    log(f"warmup (compile): {time.perf_counter()-t0:.1f}s")

    # QPS: store.search is synchronous (host fetch per call); overlap
    # calls on a thread pool — the store's snapshot-under-lock design
    # lets concurrent scans overlap on device
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(depth)
    qps_rounds = []
    for r in range(7):
        t0 = time.perf_counter()
        futs = [pool.submit(search, q_batches[i % len(q_batches)])
                for i in range(depth)]
        for fu in futs:
            fu.result()
        dt = time.perf_counter() - t0
        if r >= 2:
            qps_rounds.append(depth * batch / dt)
    qps = float(np.median(qps_rounds))

    _, ids = search(eval_q)
    rec = float(np.mean(
        [len(set(gt[i]) & set(np.asarray(ids)[i])) / k
         for i in range(len(gt))]
    ))
    log(f"serve: {qps:.0f} QPS, recall@10 vs fp32 {rec:.3f}")
    print(json.dumps({
        "metric": (f"coarse{coarse_c}-residual-OPQ(M={m})+f8-cache"
                   "+reconstruction-rerank QPS/chip at recall@10 "
                   "(10M x 768d clustered+spectrum, batch=512, "
                   "FlatStore serve-from-snapshot)"),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 71.4, 2),
        "recall_at_10": round(rec, 4),
        "recall_queries": int(len(gt)),
        "qps_rounds": [round(x, 1) for x in qps_rounds],
        "load_s": round(load_s, 1),
        "snapshot_gb": round(os.path.getsize(path) / 1e9, 2),
        "devices": len(jax.devices()),
    }))


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    import coltt_tpu.ops.topk as topk_mod
    from coltt_tpu.ops.distance import Metric, scan_distances
    from coltt_tpu.ops.pq import (
        default_subspaces, pq_encode, pq_scan_neg_topk, pq_sqnorm, train_pq,
    )
    from coltt_tpu.ops.topk import merge_topk, scan_neg_topk
    from coltt_tpu.store.flat import _cache_block_for, _pq_cache_rows

    # 10 x 2^20 rows: block-aligned for the auto-blocked scan (stores allocate
    # in 8192-row quanta; the bench mirrors that)
    n_total, d, k = 10 * (1 << 20), 768, 10
    chunk_n = 1 << 18  # 0.25M-row transients: the residual mode's extra
    # per-chunk arrays (rotated copy + residual + recon-sqnorm blocks) OOM'd
    # 16 GB HBM at 1<<19 next to the ~10 GB steady state
    batch = 512
    depth = 8
    n_eval = 256  # r04: 2560 gt pairs (std ~6e-3 at p~.85; was 64 queries)
    n_centers = 16384
    sigma = 0.35
    # Residual (coarse+PQ) by default: a 16384-centroid whole-vector
    # coarse quantizer absorbs the cluster structure and the dsub=8 PQ
    # encodes only the residual — 98 B/row durable (2-byte cid + 96
    # codes) vs plain dsub=4's 192 B/row, at far higher reconstruction
    # fidelity on clustered data (ops/pq.py module doc; VERDICT r2 item
    # 5's recall>=0.85 bar at 10M). ``--plain`` reruns the r1/r2
    # plain-OPQ dsub=4 configuration for comparison.
    plain = "--plain" in sys.argv
    # --nocache: pq_cache=False serving — codes only, no f8 reconstruction
    # cache. This is what frees the HBM for dsub=2 (M=384, 386 B/row) at
    # 10M: the f8 cache's 7.7 GB is exactly what made coarse+M=384 OOM in
    # r03 (VERDICT r3 item 3 names this experiment). Serving is blockwise
    # ADC (+ exact-reconstruction rerank of the shortlist).
    nocache = "--nocache" in sys.argv
    # --roundtrip: after measuring, adopt the built arrays into a real
    # FlatStore, flush it to disk, free device state, and time the load
    # (incl. the f8 cache rebuild) — the flush/load leg of VERDICT r4 #2
    roundtrip = "--roundtrip" in sys.argv
    # Two-phase mode (the M=384 configuration REQUIRES it): --save-to P
    # ingests, adopts into a FlatStore, snapshots to P and exits;
    # --serve-from P loads the snapshot in a FRESH process and measures.
    # Measured rationale: after the 10M ingest the heap is fragmented
    # enough that ops needing <0.5 GiB of contiguous scratch OOM with ~4
    # GiB nominally free (probed: the same rerank runs with 0.45 GiB free
    # on a clean heap). Build transients and serving state should not
    # share a heap — the durable artifact is the codes; serving loads
    # them and rebuilds the f8 cache (production FlatStore.load path).
    save_to = serve_from = None
    if "--save-to" in sys.argv:
        save_to = sys.argv[sys.argv.index("--save-to") + 1]
    if "--serve-from" in sys.argv:
        serve_from = sys.argv[sys.argv.index("--serve-from") + 1]
    dsub = 4
    if "--dsub" in sys.argv:
        dsub = int(sys.argv[sys.argv.index("--dsub") + 1])
    if "--chunk" in sys.argv:
        chunk_n = 1 << int(sys.argv[sys.argv.index("--chunk") + 1])
    if plain:
        m, coarse_c = default_subspaces(d, target_dsub=4), 0
    else:
        # dsub=4 ON TOP of the coarse quantizer: measured at 10M, coarse +
        # dsub=8 (98 B/row) lands at recall .73 ~= plain dsub=4's .71 —
        # same within-cluster ranking fidelity for half the bytes; the
        # recall>=0.85 bar needs the residual bits doubled (194 B/row)
        # measured sweep at 10M (recall@10 via the f8-cache+rerank path):
        #   plain dsub=4 (192 B/row)        .714  (r1/r2 number)
        #   coarse16384 + dsub=8 (98 B/row) .730  — same fidelity, half bytes
        #   coarse16384 + dsub=4 (194 B/row) .825
        #   coarse16384 + dsub=2 (386 B/row) see README (the recall>=0.85 point)
        m, coarse_c = default_subspaces(d, target_dsub=dsub), 16384

    # the default 2 GB per-block score transient is sized for ~10 GB of
    # resident state; the M=384 cache config holds ~12.3 GiB steady next
    # to ~15.5 GiB usable, so shrink the scan blocks (more lax.map steps,
    # bounded memory) — serving phase included
    topk_mod.SCORES_BYTES_BUDGET = 512 << 20

    if serve_from:
        _serve_phase(serve_from, batch=batch, depth=depth, k=k,
                     n_eval=n_eval, m=m, coarse_c=coarse_c)
        return

    log(f"devices: {jax.devices()}  M={m} coarse={coarse_c}")
    key = jax.random.PRNGKey(0)
    kc_, kq, key = jax.random.split(key, 3)
    spec_scale = jnp.asarray(
        (np.arange(1, d + 1) ** -0.5).astype(np.float32)
    )
    centers = jax.random.normal(kc_, (n_centers, d), jnp.float32) * spec_scale

    @partial(jax.jit, static_argnames=("n",))
    def gen_rows(k1, n):
        ka, kb = jax.random.split(k1)
        asg = jax.random.randint(ka, (n,), 0, n_centers)
        noise = jax.random.normal(kb, (n, d), jnp.float32) * spec_scale
        return jnp.take(centers, asg, axis=0) + sigma * noise

    eval_q = gen_rows(kq, n_eval)

    @jax.jit
    def exact_chunk_topk(q, chunk):
        sqn = jnp.sum(chunk * chunk, axis=1)
        dist = scan_distances(q, chunk, None, sqnorm=sqn, valid=None,
                              metric=Metric.COSINE, compute_dtype=jnp.float32)
        return lax.top_k(-dist, k)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def fold_chunk(pq_codes, f8_codes, f8_scale, f8_sqn, chunk, codebook, off):
        # authoritative codes + the f8 cache OF THE RECONSTRUCTION (what
        # FlatStore PQ mode serves; the store's blocked builder — the
        # reconstruct gather lane-pads ~16x, so unblocked it would be
        # ~48 GB per 1M-row chunk); recall is PQ-capped by construction
        pqc, _ = pq_encode(chunk, codebook)
        c8, s8, q8 = _pq_cache_rows(
            pqc, codebook.centroids, codebook.coarse,
            block=_cache_block_for(chunk_n, m),
        )
        return (
            lax.dynamic_update_slice_in_dim(pq_codes, pqc, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_codes, c8, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_scale, s8, off, axis=0),
            lax.dynamic_update_slice_in_dim(f8_sqn, q8, off, axis=0),
        )

    @partial(jax.jit, donate_argnums=(0,))
    def fold_codes_only(pq_codes, chunk, codebook, off):
        pqc, _ = pq_encode(chunk, codebook)
        return lax.dynamic_update_slice_in_dim(pq_codes, pqc, off, axis=0)

    # train BEFORE allocating the big output arrays: at M=384 the Lloyd /
    # OPQ transients are ~4 GB, which OOMs next to 11.6 GB of
    # codes+cache zeros (the r03/r04 "--dsub 2 + cache OOM" — VERDICT r4
    # #2 names exactly this build-transient-vs-resident-state conflict)
    t_ingest0 = time.perf_counter()
    train_key, key = jax.random.split(key)
    train_chunk = gen_rows(train_key, max(chunk_n, 262144))
    t0 = time.perf_counter()
    # residual mode trains the coarse k-means on a 262k sample
    # (16 rows/centroid at C=16384; a 64k sample would leave
    # centroids starved)
    codebook = train_pq(
        train_chunk[:262144], m=m, iters=10, opq_iters=4,
        sample_size=65536 if plain else 262144,
        coarse_centroids=coarse_c,
    )
    jax.block_until_ready(codebook.centroids)
    del train_chunk
    log(f"OPQ+PQ train (10 lloyd x 4 opq, coarse={coarse_c}): "
        f"{time.perf_counter()-t0:.1f}s")

    cw = m + (2 if coarse_c else 0)  # residual: 2-byte cid prefix
    pq_codes = jnp.zeros((n_total, cw), jnp.uint8)
    if nocache:
        f8_codes = f8_scale = f8_sqn = None
    else:
        f8_codes = jnp.zeros((n_total, d), jnp.float8_e4m3fn)
        f8_scale = jnp.zeros((n_total, 1), jnp.float32)
        f8_sqn = jnp.zeros((n_total,), jnp.float32)
    gt_neg = gt_ids = None
    n_chunks = n_total // chunk_n
    for ci in range(n_chunks):
        kchunk, key = jax.random.split(key)
        chunk = gen_rows(kchunk, chunk_n)
        # exact fp32 ground truth, merged incrementally before the chunk dies
        neg, ids = exact_chunk_topk(eval_q, chunk)
        ids = ids + ci * chunk_n
        if gt_neg is None:
            gt_neg, gt_ids = neg, ids
        else:
            gt_neg, gt_ids = merge_topk(gt_neg, gt_ids, neg, ids, k=k)
        if nocache:
            pq_codes = fold_codes_only(pq_codes, chunk, codebook,
                                       ci * chunk_n)
        else:
            pq_codes, f8_codes, f8_scale, f8_sqn = fold_chunk(
                pq_codes, f8_codes, f8_scale, f8_sqn, chunk,
                codebook, ci * chunk_n,
            )
        del chunk
        np.asarray(gt_neg[0, 0])  # sync point (fetch forces completion)
        log(f"chunk {ci+1}/{n_chunks} ingested "
            f"({time.perf_counter()-t_ingest0:.0f}s elapsed)")

    valid = jnp.ones(n_total, bool)
    log(f"ingest total (gen+train+encode+cache+GT): "
        f"{time.perf_counter()-t_ingest0:.1f}s")
    gt = np.asarray(gt_ids)

    # --noadc: skip the blockwise-ADC comparison leg entirely — at M=384
    # its pq_sqnorm/reconstruct transients crowd the 12.3 GiB steady
    # state, and the serving path under measurement doesn't use it
    noadc = "--noadc" in sys.argv
    if noadc:
        pq_sqn = None
    else:
        pq_sqn = pq_sqnorm(pq_codes, codebook)
        jax.block_until_ready(pq_sqn)
        log("pq_sqnorm ready")
    rot = codebook.rotation

    if "--probe" in sys.argv:
        # measure actual free HBM after ingest (0.25 GiB blocks until OOM)
        probe_blocks, free = [], 0.0
        kp = jax.random.PRNGKey(99)
        try:
            for i in range(80):
                kp, sk = jax.random.split(kp)
                b = jax.random.normal(sk, (1 << 26,), jnp.float32)
                jax.block_until_ready(b)
                float(b[0])
                probe_blocks.append(b)
                free += 0.25
        except Exception:
            pass
        del probe_blocks
        log(f"probe: ~{free:.2f} GiB free after ingest")

    # -- serving dispatches ----------------------------------------------------
    # the cache lives in OPQ-rotated space: rotate queries once per batch
    def dispatch_cache(q):
        # production PQ serving path: f8 reconstruction cache shortlist
        # (ApproxTopK) + exact-reconstruction rerank of the top 4k
        from coltt_tpu.ops.pq import pq_rerank_neg_topk

        qr = q @ rot if rot is not None else q
        negd, ids = scan_neg_topk(qr, f8_codes, f8_scale, f8_sqn, valid,
                                  k=4 * k, metric=Metric.COSINE,
                                  approx_recall=0.99)
        return pq_rerank_neg_topk(qr, negd, ids, pq_codes,
                                  codebook.centroids, k=k,
                                  metric=Metric.COSINE,
                                  coarse=codebook.coarse)

    def dispatch_adc(q):
        # low-memory path: ADC over the uint8 codes only
        return pq_scan_neg_topk(q, pq_codes, codebook.centroids, pq_sqn, valid,
                                k=k, metric=Metric.COSINE, rotation=rot,
                                coarse=codebook.coarse)

    def dispatch_adc_rerank(q):
        # no-cache production path: ADC shortlist (4k) + exact PQ
        # reconstruction rerank — the recall step the f8cache path gets
        # from pq_rerank_neg_topk, without the 7.7 GB cache
        from coltt_tpu.ops.pq import pq_rerank_neg_topk

        negd, ids = pq_scan_neg_topk(
            q, pq_codes, codebook.centroids, pq_sqn, valid,
            k=4 * k, metric=Metric.COSINE, rotation=rot,
            coarse=codebook.coarse,
        )
        qr = q @ rot if rot is not None else q
        return pq_rerank_neg_topk(qr, negd, ids, pq_codes,
                                  codebook.centroids, k=k,
                                  metric=Metric.COSINE,
                                  coarse=codebook.coarse)

    kq2, key = jax.random.split(key)
    q_batches = [
        gen_rows(jax.random.fold_in(kq2, i), batch) for i in range(depth)
    ]
    np.asarray(q_batches[-1][0, 0])

    if save_to and not nocache:
        from coltt_tpu.store.flat import FlatStore

        store = FlatStore.adopt_pq(
            codebook, pq_codes, cache=(f8_codes, f8_scale, f8_sqn),
        )
        t0 = time.perf_counter()
        with open(save_to, "wb") as f:
            store.save(f)
        save_s = time.perf_counter() - t0
        np.savez(
            save_to + ".aux.npz", gt=gt, eval_q=np.asarray(eval_q),
            q_batches=np.stack([np.asarray(b) for b in q_batches]),
        )
        log(f"saved snapshot: {save_s:.1f}s "
            f"({os.path.getsize(save_to)/1e9:.2f} GB) -> {save_to}")
        print(json.dumps({"phase": "save", "save_s": round(save_s, 1),
                          "snapshot_gb": round(
                              os.path.getsize(save_to) / 1e9, 2),
                          "ingest_s": round(
                              time.perf_counter() - t_ingest0, 1)}))
        return

    if "--stagecheck" in sys.argv and not nocache:
        # localize any OOM: scan stage, then rerank stage, each synced
        from coltt_tpu.ops.pq import pq_rerank_neg_topk as _pqrr
        qr0 = q_batches[0] @ rot if rot is not None else q_batches[0]
        t0 = time.perf_counter()
        negd0, ids0 = scan_neg_topk(qr0, f8_codes, f8_scale, f8_sqn, valid,
                                    k=4 * k, metric=Metric.COSINE,
                                    approx_recall=0.99)
        jax.block_until_ready((negd0, ids0))
        log(f"stage: f8-cache scan ok ({time.perf_counter()-t0:.1f}s)")
        t0 = time.perf_counter()
        out0 = _pqrr(qr0, negd0, ids0, pq_codes, codebook.centroids, k=k,
                     metric=Metric.COSINE, coarse=codebook.coarse)
        jax.block_until_ready(out0)
        log(f"stage: pq rerank ok ({time.perf_counter()-t0:.1f}s)")
        del negd0, ids0, out0, qr0

    results = {}
    paths = ([("adc+rerank", dispatch_adc_rerank), ("adc", dispatch_adc)]
             if nocache else
             [("f8cache", dispatch_cache), ("adc", dispatch_adc)])
    if noadc:
        paths = [p for p in paths if p[0] != "adc"]
    for name, fn in paths:
        t0 = time.perf_counter()
        np.asarray(fn(q_batches[0])[0])
        log(f"{name} warmup (compile): {time.perf_counter()-t0:.1f}s")
        qps_rounds = []
        for r in range(7):
            t0 = time.perf_counter()
            outs = [fn(q_batches[i]) for i in range(depth)]
            total = sum(o[0].sum() for o in outs)  # one fetch syncs all
            np.asarray(total)
            dt = time.perf_counter() - t0
            if r >= 2:
                qps_rounds.append(depth * batch / dt)
        best = float(np.median(qps_rounds))
        _, ids = fn(eval_q)
        ids = np.asarray(ids)
        rec = float(np.mean(
            [len(set(gt[i]) & set(ids[i])) / k for i in range(n_eval)]
        ))
        log(f"{name}: {best:.0f} QPS, recall@10 vs fp32 {rec:.3f}")
        results[name] = (best, rec)

    rt = None
    if roundtrip and not nocache:
        # flush/load round trip through the real FlatStore (VERDICT r4 #2
        # done-bar): adopt the arrays (no copy), stream-save the snapshot,
        # drop ALL device state, and time load = read codes + rebuild the
        # f8 cache from them. Recall is re-checked on the loaded store.
        import tempfile

        from coltt_tpu.store.flat import FlatStore

        store = FlatStore.adopt_pq(
            codebook, pq_codes, cache=(f8_codes, f8_scale, f8_sqn),
        )
        path = os.path.join(tempfile.gettempdir(), "bench_pq_snapshot.bin")
        t0 = time.perf_counter()
        with open(path, "wb") as f:
            store.save(f)
        save_s = time.perf_counter() - t0
        sz_gb = os.path.getsize(path) / 1e9
        log(f"flush: {save_s:.1f}s ({sz_gb:.2f} GB)")
        eval_np = np.asarray(eval_q)
        del store, pq_codes, f8_codes, f8_scale, f8_sqn, pq_sqn, valid
        del q_batches, eval_q
        import gc as _gc
        _gc.collect()
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            loaded = FlatStore.load(f)
        np.asarray(jax.device_get(loaded.sqnorm[:1]))
        load_s = time.perf_counter() - t0
        _, ids = loaded.search(eval_np, k, oversample=4, approx_recall=0.99)
        rec_rt = float(np.mean(
            [len(set(gt[i]) & set(np.asarray(ids)[i])) / k
             for i in range(n_eval)]
        ))
        log(f"load (read codes + rebuild f8 cache): {load_s:.1f}s; "
            f"loaded-store recall@10 {rec_rt:.3f}")
        os.remove(path)
        rt = {"save_s": round(save_s, 1), "load_s": round(load_s, 1),
              "snapshot_gb": round(sz_gb, 2),
              "loaded_recall_at_10": round(rec_rt, 4)}

    qps, rec = results["adc+rerank" if nocache else "f8cache"]
    print(json.dumps({
        "metric": (f"{'OPQ' if plain else f'coarse{coarse_c}-residual-OPQ'}"
                   f"(M={m})+"
                   f"{'blockwise-ADC' if nocache else 'f8-cache'}"
                   "+reconstruction-rerank QPS/chip at "
                   "recall@10 (10M x 768d clustered+spectrum, batch=512)"),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 71.4, 2),  # reference PQ era: <14ms @ 50k
        "recall_at_10": round(rec, 4),
        "adc_qps": round(results["adc"][0], 1) if "adc" in results else None,
        "adc_recall_at_10": (round(results["adc"][1], 4)
                             if "adc" in results else None),
        "devices": len(jax.devices()),
        "roundtrip": rt,
    }))


if __name__ == "__main__":
    main()

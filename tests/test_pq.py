"""Product quantization: training convergence, encode fidelity, ADC recall.

The reference reserved PQ (proto enum + pkg/distancepq) without shipping it
(SURVEY.md §7 phase 9), so the contracts here are ours: reconstruction error
must shrink vs a random codebook, codebook save/load must be bit-exact, and
ADC top-k recall@10 on clustered data must stay high vs the fp32 scan.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coltt_tpu.ops.distance import Metric
from coltt_tpu.ops.pq import (
    PQCodebook,
    default_subspaces,
    pq_encode,
    pq_reconstruct,
    pq_scan_topk,
    train_pq,
)
from coltt_tpu.ops.topk import scan_topk


def _clustered(rng, n, dim, n_clusters=32, spread=0.15):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    return (
        centers[assign] + spread * rng.standard_normal((n, dim)).astype(np.float32)
    ).astype(np.float32)


def test_default_subspaces():
    assert default_subspaces(768) == 96
    assert default_subspaces(128) == 16
    assert 100 % default_subspaces(100) == 0


def test_train_reduces_reconstruction_error(rng):
    x = _clustered(rng, 4096, 64)
    cb = train_pq(x, m=8, n_centroids=64, iters=10, key=jax.random.PRNGKey(1))
    codes, _ = pq_encode(x, cb)
    rec = np.asarray(pq_reconstruct(codes, cb))
    err = np.mean(np.sum((rec - x) ** 2, axis=1))

    # random codebook baseline: centroids drawn from the data distribution
    rand = PQCodebook(
        jnp.asarray(
            rng.standard_normal((8, 64, 8)).astype(np.float32)
        )
    )
    codes_r, _ = pq_encode(x, rand)
    rec_r = np.asarray(pq_reconstruct(codes_r, rand))
    err_r = np.mean(np.sum((rec_r - x) ** 2, axis=1))
    assert err < 0.5 * err_r, f"trained {err} vs random {err_r}"


def test_residual_mode_beats_plain_pq(rng):
    """coarse+PQ (residual) reconstruction error must land well below
    plain PQ at the same code budget on cluster-structured data — the
    coarse table absorbs the cluster term, the codes encode only the
    residual."""
    x = _clustered(rng, 6144, 64, n_clusters=48, spread=0.15)
    plain = train_pq(x, m=8, n_centroids=64, iters=10,
                     key=jax.random.PRNGKey(1))
    resid = train_pq(x, m=8, n_centroids=64, iters=10,
                     key=jax.random.PRNGKey(1),
                     coarse_centroids=64, coarse_iters=8)
    assert resid.coarse is not None and resid.code_width == 10

    c_p, sq_p = pq_encode(x, plain)
    c_r, sq_r = pq_encode(x, resid)
    assert c_p.shape == (6144, 8) and c_r.shape == (6144, 10)
    rec_p = np.asarray(pq_reconstruct(c_p, plain))
    rec_r = np.asarray(pq_reconstruct(c_r, resid))
    err_p = np.mean(np.sum((rec_p - x) ** 2, axis=1))
    err_r = np.mean(np.sum((rec_r - x) ** 2, axis=1))
    assert err_r < 0.5 * err_p, f"residual {err_r} vs plain {err_p}"
    # sqnorm contract holds in residual mode too (blocked reconstruct path)
    np.testing.assert_allclose(
        np.asarray(sq_r), np.sum(rec_r * rec_r, axis=1), rtol=1e-4
    )


def test_residual_scan_rerank_and_roundtrip(rng):
    """Residual codes flow through ADC scan, the exact-reconstruction
    rerank, pq_sqnorm, and codebook save/load."""
    from coltt_tpu.ops.pq import (
        pq_rerank_neg_topk, pq_scan_neg_topk, pq_sqnorm,
    )

    n, dim, k = 4096, 64, 10
    x = _clustered(rng, n, dim, n_clusters=48)
    q = _clustered(rng, 8, dim, n_clusters=48)
    cb = train_pq(x, m=8, n_centroids=64, iters=10,
                  key=jax.random.PRNGKey(3), opq_iters=2,
                  coarse_centroids=64)
    codes, sqn = pq_encode(x, cb)
    sqn2 = pq_sqnorm(codes, cb)
    np.testing.assert_allclose(np.asarray(sqn), np.asarray(sqn2), rtol=1e-4)

    valid = jnp.ones(n, bool)
    negd, ids = pq_scan_neg_topk(
        jnp.asarray(q), codes, cb.centroids, sqn, valid, k=4 * k,
        metric=Metric.COSINE, rotation=cb.rotation, coarse=cb.coarse,
    )
    rneg, rids = pq_rerank_neg_topk(
        jnp.asarray(q), negd, ids, codes, cb.centroids, k=k,
        metric=Metric.COSINE, rotation=cb.rotation, coarse=cb.coarse,
    )
    rids = np.asarray(rids)
    # the scan must track the reconstruction's own cosine ranking (the
    # machinery contract; absolute recall vs fp32 is a data/bit-budget
    # property benchmarked at scale in bench_pq.py, not asserted here)
    rec = np.asarray(pq_reconstruct(codes, cb))
    qr = np.asarray(jnp.asarray(q) @ cb.rotation)
    cos = (qr @ rec.T) / (
        np.linalg.norm(qr, axis=1, keepdims=True)
        * np.maximum(np.linalg.norm(rec, axis=1), 1e-30)
    )
    manual = np.argsort(-cos, axis=1)[:, :k]
    agree = np.mean(
        [len(set(rids[i]) & set(manual[i])) / k for i in range(8)]
    )
    assert agree >= 0.85, f"scan/rerank vs manual reconstruction {agree}"

    # and the residual codes must RANK better against fp32 truth than
    # plain PQ at the same subspace budget (the mode's reason to exist)
    sqx = jnp.sum(jnp.asarray(x) ** 2, axis=1)
    _, gt = scan_topk(jnp.asarray(q), jnp.asarray(x), None, sqx, valid, k=k)
    gt = np.asarray(gt)

    plain = train_pq(x, m=8, n_centroids=64, iters=10,
                     key=jax.random.PRNGKey(3), opq_iters=2)
    pcodes, psqn = pq_encode(x, plain)
    _, pids = pq_scan_neg_topk(
        jnp.asarray(q), pcodes, plain.centroids, psqn, valid, k=k,
        metric=Metric.COSINE, rotation=plain.rotation,
    )
    pids = np.asarray(pids)

    def recall(found):
        return np.mean([len(set(gt[i]) & set(found[i])) / k for i in range(8)])

    assert recall(rids[:, :k]) >= recall(pids), (
        f"residual {recall(rids[:, :k])} < plain {recall(pids)}"
    )

    buf = io.BytesIO()
    cb.save(buf)
    buf.seek(0)
    cb2 = PQCodebook.load(buf)
    assert cb2.coarse is not None
    np.testing.assert_array_equal(np.asarray(cb.coarse), np.asarray(cb2.coarse))
    codes2, _ = pq_encode(x[:64], cb2)
    np.testing.assert_array_equal(np.asarray(codes[:64]), np.asarray(codes2))


def test_encode_sqnorm_matches_reconstruction(rng):
    x = rng.standard_normal((512, 32)).astype(np.float32)
    cb = train_pq(x, m=4, n_centroids=16, iters=5)
    codes, sqnorm = pq_encode(x, cb)
    assert codes.dtype == jnp.uint8
    rec = np.asarray(pq_reconstruct(codes, cb))
    np.testing.assert_allclose(
        np.asarray(sqnorm), np.sum(rec * rec, axis=1), rtol=1e-4, atol=1e-4
    )


def test_codebook_roundtrip(rng):
    x = rng.standard_normal((1024, 48)).astype(np.float32)
    cb = train_pq(x, m=6, n_centroids=32, iters=3)
    buf = io.BytesIO()
    cb.save(buf)
    buf.seek(0)
    cb2 = PQCodebook.load(buf)
    np.testing.assert_array_equal(
        np.asarray(cb.centroids), np.asarray(cb2.centroids)
    )
    assert (cb2.m, cb2.n_centroids, cb2.dsub) == (6, 32, 8)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_adc_shortlist_recall_on_clustered_data(metric, rng):
    """Recall 10@100: the exact top-10 must live inside the PQ top-100
    shortlist — the property ADC is used for in production (shortlist +
    rerank). Direct recall@10 is inherently noisy for PQ because
    within-cluster neighbors are near-equidistant."""
    n, dim, k, shortlist = 8192, 64, 10, 100
    x = _clustered(rng, n, dim)
    q = _clustered(rng, 16, dim)
    cb = train_pq(x, m=16, n_centroids=256, iters=12, key=jax.random.PRNGKey(2))
    codes, sqnorm = pq_encode(x, cb)
    valid = jnp.ones(n, bool)

    _, i_pq = pq_scan_topk(
        q, codes, cb, sqnorm, valid, k=shortlist, metric=metric,
        compute_dtype=jnp.float32,
    )
    sq_exact = jnp.sum(jnp.asarray(x) ** 2, axis=1)
    _, i_gt = scan_topk(
        q, jnp.asarray(x), None, sq_exact, valid, k=k, metric=metric,
        compute_dtype=jnp.float32,
    )
    i_pq, i_gt = np.asarray(i_pq), np.asarray(i_gt)
    recall = np.mean(
        [len(set(i_pq[i]) & set(i_gt[i])) / k for i in range(q.shape[0])]
    )
    assert recall >= 0.9, f"{metric.name} ADC recall {k}@{shortlist} = {recall}"


def test_adc_respects_tombstones(rng):
    n, dim = 1024, 32
    x = rng.standard_normal((n, dim)).astype(np.float32)
    cb = train_pq(x, m=4, n_centroids=64, iters=5)
    codes, sqnorm = pq_encode(x, cb)
    valid = np.ones(n, bool)
    dead = rng.choice(n, 200, replace=False)
    valid[dead] = False
    _, ids = pq_scan_topk(
        x[:8], codes, cb, sqnorm, jnp.asarray(valid), k=20,
        metric=Metric.COSINE,
    )
    assert not (set(np.asarray(ids).ravel().tolist()) & set(dead.tolist()))


def test_blocked_scan_matches_unblocked(rng):
    from coltt_tpu.ops.pq import pq_scan_neg_topk

    n, dim = 2048, 32
    x = rng.standard_normal((n, dim)).astype(np.float32)
    cb = train_pq(x, m=8, n_centroids=32, iters=5)
    codes, sqnorm = pq_encode(x, cb)
    valid = jnp.ones(n, bool)
    q = rng.standard_normal((4, dim)).astype(np.float32)

    d1, i1 = pq_scan_neg_topk(
        q, codes, cb.centroids, sqnorm, valid, k=5,
        compute_dtype=jnp.float32, block_rows=n,
    )
    d2, i2 = pq_scan_neg_topk(
        q, codes, cb.centroids, sqnorm, valid, k=5,
        compute_dtype=jnp.float32, block_rows=512,
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pq_sqnorm_blocked_matches_reconstruction(rng):
    """Direct coverage of pq_sqnorm: blocked (multi-block + remainder)
    results equal the exact reconstruction norms."""
    from coltt_tpu.ops.pq import pq_reconstruct, pq_sqnorm

    vecs = rng.standard_normal((1000, 32)).astype(np.float32)  # not a
    cb = train_pq(vecs, m=4, n_centroids=16, iters=4, sample_size=1000)
    codes, enc_sqn = pq_encode(jnp.asarray(vecs), cb)
    want = np.sum(np.asarray(pq_reconstruct(codes, cb)) ** 2, axis=1)
    for block in (64, 1000, 4096, 333):  # multi-block, exact, oversize, remainder
        got = np.asarray(pq_sqnorm(codes, cb, block=block))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(enc_sqn), want, rtol=1e-5, atol=1e-4)


def test_opq_rotation_roundtrip_and_orthonormal(rng):
    from coltt_tpu.ops.pq import pq_reconstruct

    d = 32
    scale = (np.arange(1, d + 1) ** -0.5).astype(np.float32)
    vecs = (rng.standard_normal((4096, d)) * scale).astype(np.float32)
    cb = train_pq(vecs, m=4, n_centroids=16, iters=4, sample_size=4096,
                  opq_iters=3)
    assert cb.rotation is not None
    r = np.asarray(cb.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(d), atol=1e-4)
    # codebook snapshot carries the rotation
    buf = io.BytesIO()
    cb.save(buf)
    buf.seek(0)
    cb2 = PQCodebook.load(buf)
    np.testing.assert_allclose(np.asarray(cb2.rotation), r, atol=0)
    # derotated reconstruction approximates the original vectors
    codes, _ = pq_encode(jnp.asarray(vecs), cb)
    rec = np.asarray(pq_reconstruct(codes, cb, derotate=True))
    base_mse = float(np.mean(vecs ** 2))
    assert float(np.mean((rec - vecs) ** 2)) < base_mse * 0.6


def test_opq_improves_recall_on_anisotropic(rng):
    """OPQ's point: on spectrum-decayed data the rotation balances variance
    across subspaces and lifts ADC recall over plain PQ."""
    from coltt_tpu.ops.pq import pq_scan_topk

    n, d, k = 8192, 64, 10
    scale = (np.arange(1, d + 1) ** -0.5).astype(np.float32)
    vecs = (rng.standard_normal((n, d)) * scale).astype(np.float32)
    qs = (rng.standard_normal((16, d)) * scale).astype(np.float32)
    gt = []
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    gt = np.argsort(-(qn @ vn.T), axis=1)[:, :k]

    def recall(opq_iters):
        cb = train_pq(vecs, m=8, iters=6, sample_size=n,
                      opq_iters=opq_iters)
        codes, sqn = pq_encode(jnp.asarray(vecs), cb)
        _, ids = pq_scan_topk(jnp.asarray(qs), codes, cb, sqn,
                              jnp.ones(n, bool), k=k)
        ids = np.asarray(ids)
        return np.mean([len(set(gt[i]) & set(ids[i])) / k
                        for i in range(len(qs))])

    r_pq = recall(0)
    r_opq = recall(4)
    assert r_opq > r_pq + 0.05, (r_pq, r_opq)


def test_flat_store_pq_opq_search_and_snapshot(rng, tmp_path):
    from coltt_tpu.store.flat import FlatStore
    from coltt_tpu.ops.quant import Quantization

    d = 32
    scale = (np.arange(1, d + 1) ** -0.5).astype(np.float32)
    vecs = (rng.standard_normal((600, d)) * scale).astype(np.float32)
    store = FlatStore(d, quantization=Quantization.PQ, pq_subspaces=4,
                      pq_centroids=16, pq_train_iters=4, pq_opq_iters=2)
    store.bulk_build([f"p{i}" for i in range(600)], vecs)
    s, slots = store.search(vecs[5], k=3)
    assert slots[0, 0] == 5
    # filtered gather path under OPQ
    s, slots = store.search(vecs[7], k=2, candidates=np.asarray([7, 9, 11]))
    assert slots[0, 0] == 7
    # snapshot roundtrip preserves rotation + results
    import io as _io
    buf = _io.BytesIO()
    store.save(buf)
    buf.seek(0)
    store2 = FlatStore.load(buf)
    assert store2.codebook.rotation is not None
    s2, slots2 = store2.search(vecs[5], k=3)
    np.testing.assert_array_equal(slots[0], store.search(vecs[7], k=2,
                                  candidates=np.asarray([7, 9, 11]))[1][0])
    assert slots2[0, 0] == 5
    # get_vector readback is in original coordinates
    rec = store2.get_vector("p5")
    assert np.mean((rec - vecs[5]) ** 2) < np.mean(vecs[5] ** 2)


def test_flat_store_pq_coarse_residual(rng, tmp_path):
    """FlatStore PQ mode with pq_coarse (residual): search works through
    the f8 cache + reconstruction rerank, snapshot roundtrips the wider
    codes + coarse table, and filtered search takes the residual-aware
    gather path."""
    from coltt_tpu.store.flat import FlatStore

    n, dim = 512, 32
    x = _clustered(rng, n, dim, n_clusters=16, spread=0.1)
    store = FlatStore(
        dim, quantization="pq", pq_subspaces=4, pq_centroids=64,
        pq_coarse=16, pq_opq_iters=2,
    )
    assert store.pq_width == 6  # 2-byte cid prefix + 4 subspace codes
    store.upsert_many([f"p{i}" for i in range(n)], x)
    store.sync()
    assert store.codebook is not None and store.codebook.coarse is not None

    scores, slots = store.search(x[:4], k=3, oversample=4)
    assert all(store.slot_to_pk[int(slots[i, 0])] == f"p{i}" for i in range(4))

    # filtered (gather regime) search
    cand = np.arange(0, 64, dtype=np.int32)
    s2, sl2 = store.search(x[1], k=1, candidates=cand)
    assert store.slot_to_pk[int(sl2[0, 0])] == "p1"

    # vector readback reconstructs through coarse + residual
    v = store.get_vector("p7")
    cos = float(v @ x[7] / (np.linalg.norm(v) * np.linalg.norm(x[7])))
    assert cos > 0.97, cos

    import io as _io
    buf = _io.BytesIO()
    store.save(buf)
    buf.seek(0)
    st2 = FlatStore.load(buf)
    assert st2.pq_coarse == 16 and st2.codebook.coarse is not None
    s3, sl3 = st2.search(x[:4], k=3, oversample=4)
    np.testing.assert_array_equal(slots, sl3)


def test_pq_cache_oversample_rerank(rng):
    """PQ-cache search with oversample re-scores the shortlist against the
    exact reconstruction: results must rank at least as well as the plain
    cache scan and agree with codes-only ADC ranking on top-1."""
    from coltt_tpu.store.flat import FlatStore
    from coltt_tpu.ops.quant import Quantization

    d = 64
    scale = (np.arange(1, d + 1) ** -0.5).astype(np.float32)
    vecs = (rng.standard_normal((2000, d)) * scale).astype(np.float32)
    cache = FlatStore(d, quantization=Quantization.PQ, pq_subspaces=8,
                      pq_centroids=32, pq_train_iters=5, pq_opq_iters=2)
    cache.bulk_build([f"p{i}" for i in range(2000)], vecs)
    adc = FlatStore(d, quantization=Quantization.PQ, pq_subspaces=8,
                    pq_centroids=32, pq_train_iters=5, pq_opq_iters=2,
                    pq_cache=False)
    adc.bulk_build([f"p{i}" for i in range(2000)], vecs)

    qs = vecs[:8] + 0.01 * rng.standard_normal((8, d)).astype(np.float32) * scale
    _, adc_ids = adc.search(qs, k=5)
    _, rr_ids = cache.search(qs, k=5, oversample=8)
    # top-1 of the reranked cache path matches exact-ADC top-1 (both rank
    # by the same exact reconstruction; the shortlist at os=8 on 2000 rows
    # cannot miss it)
    match = np.mean(adc_ids[:, 0] == rr_ids[:, 0])
    assert match >= 0.9, match
    # shapes/scores sane
    s, ids = cache.search(qs, k=5, oversample=4)
    assert ids.shape == (8, 5) and np.isfinite(s[:, 0]).all()

"""Distance kernel + streaming top-k correctness vs numpy ground truth."""

import numpy as np
import pytest
import jax.numpy as jnp

from coltt_tpu.ops.distance import Metric, distance_pair, scan_distances
from coltt_tpu.ops.quant import Quantization, quantize, dequantize
from coltt_tpu.ops.score import denormalize_score, normalize_score
from coltt_tpu.ops.topk import merge_topk, scan_topk


def _np_dist(q, v, metric):
    if metric == Metric.COSINE:
        num = q @ v.T
        den = np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
        return 1.0 - num / den
    if metric == Metric.EUCLIDEAN:
        return ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    return np.abs(q[:, None, :] - v[None, :, :]).sum(-1)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN, Metric.MANHATTAN])
def test_scan_distances_matches_numpy(metric, rng):
    q = rng.standard_normal((4, 96), dtype=np.float32)
    v = rng.standard_normal((64, 96), dtype=np.float32)
    sqn = (v * v).sum(1)
    got = np.asarray(
        scan_distances(
            q, v, None, sqnorm=jnp.asarray(sqn), metric=metric,
            compute_dtype=jnp.float32,
        )
    )
    want = _np_dist(q, v, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_invalid_rows_get_inf(rng):
    q = rng.standard_normal((2, 32), dtype=np.float32)
    v = rng.standard_normal((8, 32), dtype=np.float32)
    sqn = (v * v).sum(1)
    valid = np.array([True, False] * 4)
    d = np.asarray(
        scan_distances(q, v, None, sqnorm=jnp.asarray(sqn), valid=jnp.asarray(valid),
                       metric=Metric.EUCLIDEAN, compute_dtype=jnp.float32)
    )
    assert np.isinf(d[:, 1::2]).all()
    assert np.isfinite(d[:, 0::2]).all()


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_distance_pair_matches_scan(metric, rng):
    x = rng.standard_normal(48, dtype=np.float32)
    y = rng.standard_normal(48, dtype=np.float32)
    got = float(distance_pair(x, y, metric))
    want = _np_dist(x[None], y[None], metric)[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_score_normalization_roundtrip():
    for metric in (Metric.COSINE, Metric.EUCLIDEAN):
        d = np.array([0.0, 0.5, 1.0, 1.7], np.float32)
        s = np.asarray(normalize_score(d, metric))
        back = np.asarray(denormalize_score(s, metric))
        np.testing.assert_allclose(back, d, atol=1e-5)
    # reference formulas: cosine ((2-d)/2)*100, euclid max(0, 100-d)
    assert float(normalize_score(np.float32(0.0), Metric.COSINE)) == 100.0
    assert float(normalize_score(np.float32(2.0), Metric.COSINE)) == 0.0
    assert float(normalize_score(np.float32(150.0), Metric.EUCLIDEAN)) == 0.0


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_scan_topk_matches_bruteforce(metric, blocks, rng):
    n, d, k = 512, 64, 10
    q = rng.standard_normal((3, d), dtype=np.float32)
    v = rng.standard_normal((n, d), dtype=np.float32)
    sqn = jnp.asarray((v * v).sum(1))
    valid = np.ones(n, bool)
    valid[::7] = False
    block_rows = n // blocks

    scores, ids = scan_topk(
        q, jnp.asarray(v), None, sqn, jnp.asarray(valid),
        k=k, metric=metric, compute_dtype=jnp.float32, block_rows=block_rows,
    )
    scores, ids = np.asarray(scores), np.asarray(ids)

    dist = _np_dist(q, v, metric)
    dist[:, ~valid] = np.inf
    kth = np.sort(dist, axis=1)[:, k - 1]
    for qi in range(3):
        # every returned id must be within fp tolerance of the true k-th
        # distance (the q^2+v^2-2qv expansion reorders exact ties)
        assert (dist[qi, ids[qi]] <= kth[qi] + 1e-3).all(), f"query {qi}"
        assert valid[ids[qi]].all()
        assert (np.diff(scores[qi]) <= 1e-5).all()  # descending


def test_scan_topk_quantized_recall(rng):
    """f8-quantized top-10 should nearly match fp32 top-10 on random data."""
    n, d, k = 2048, 128, 10
    q = rng.standard_normal((8, d), dtype=np.float32)
    v = rng.standard_normal((n, d), dtype=np.float32)
    codes, scale = quantize(v, Quantization.F8)
    deq = np.asarray(dequantize(codes, scale))
    sqn = jnp.asarray((deq * deq).sum(1))

    scores, ids = scan_topk(
        q, codes, scale, sqn, jnp.ones(n, bool), k=k, metric=Metric.COSINE,
        compute_dtype=jnp.float32,
    )
    dist = _np_dist(q, v, Metric.COSINE)
    want = np.argsort(dist, axis=1)[:, :k]
    recall = np.mean(
        [len(set(np.asarray(ids)[i]) & set(want[i])) / k for i in range(8)]
    )
    assert recall >= 0.9, f"f8 recall@10 too low: {recall}"


def test_merge_topk(rng):
    a = np.array([[9.0, 5.0, 1.0]], np.float32)
    ia = np.array([[0, 1, 2]], np.int32)
    b = np.array([[8.0, 6.0, 2.0]], np.float32)
    ib = np.array([[10, 11, 12]], np.int32)
    vs, ids = merge_topk(a, ia, b, ib, k=4)
    np.testing.assert_array_equal(np.asarray(vs)[0], [9.0, 8.0, 6.0, 5.0])
    np.testing.assert_array_equal(np.asarray(ids)[0], [0, 10, 11, 1])

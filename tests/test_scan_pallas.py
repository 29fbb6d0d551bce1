"""Fused Pallas scan+top-k vs the exact XLA scan (interpret mode on CPU).

The kernel keeps one candidate per 128-row bin, so on planted data (each
true hit in a distinct bin) it must match the exact scan exactly; on
random data it may drop a colliding hit, which the overlap bound checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from coltt_tpu.ops.distance import Metric
from coltt_tpu.ops.quant import Quantization, dequantize, quantize
from coltt_tpu.ops.scan_pallas import BIN_ROWS, fused_scan_topk, supports
from coltt_tpu.ops.topk import scan_topk

N, D, K = 8192, 128, 5


def _store(rng, n=N, d=D):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    codes, scale = quantize(jnp.asarray(vecs), Quantization.F8)
    deq = dequantize(codes, scale)
    sqnorm = jnp.sum(deq * deq, axis=1)
    return vecs, codes, scale, sqnorm


def test_supports():
    assert supports(8192, 768, Metric.COSINE, jnp.float8_e4m3fn)
    assert not supports(8192, 100, Metric.COSINE, jnp.float8_e4m3fn)
    assert not supports(1000, 768, Metric.COSINE, jnp.float8_e4m3fn)
    assert not supports(8192, 768, Metric.MANHATTAN, jnp.float8_e4m3fn)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_fused_matches_exact_on_planted(rng, metric):
    """Plant near-duplicates of the query in well-separated bins."""
    vecs, codes, scale, sqnorm = _store(rng)
    q = rng.standard_normal((3, D)).astype(np.float32)
    valid = jnp.ones((N,), bool)
    # plant K hits for query 0 in distinct bins
    planted = [17, BIN_ROWS * 5 + 3, BIN_ROWS * 20, BIN_ROWS * 40 + 99,
               BIN_ROWS * 60 + 1]
    v2 = vecs.copy()
    for j, slot in enumerate(planted):
        v2[slot] = q[0] * (1.0 + 0.01 * j)
    codes, scale = quantize(jnp.asarray(v2), Quantization.F8)
    deq = dequantize(codes, scale)
    sqnorm = jnp.sum(deq * deq, axis=1)

    s_exact, i_exact = scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    s_fused, i_fused = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    if metric == Metric.COSINE:
        # all planted rows are exact top-K for query 0
        assert set(np.asarray(i_fused)[0].tolist()) == set(planted)
    np.testing.assert_allclose(
        np.asarray(s_fused)[0], np.asarray(s_exact)[0], rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_fused_overlap_on_random(rng, metric):
    vecs, codes, scale, sqnorm = _store(rng)
    q = rng.standard_normal((4, D)).astype(np.float32)
    valid = jnp.ones((N,), bool)
    s_exact, i_exact = scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    s_fused, i_fused = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    for r in range(4):
        overlap = set(np.asarray(i_fused)[r].tolist()) & set(
            np.asarray(i_exact)[r].tolist())
        assert len(overlap) >= K - 1  # at most one bin collision plausible


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_fused_int8_path_overlap(rng, metric):
    """int8 codes take the s8 MXU path (queries quantized on the fly)."""
    vecs = rng.standard_normal((N, D)).astype(np.float32)
    codes, scale = quantize(jnp.asarray(vecs), Quantization.I8)
    deq = dequantize(codes, scale)
    sqnorm = jnp.sum(deq * deq, axis=1)
    q = rng.standard_normal((4, D)).astype(np.float32)
    valid = jnp.ones((N,), bool)
    s_exact, i_exact = scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    s_fused, i_fused = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric)
    for r in range(4):
        overlap = set(np.asarray(i_fused)[r].tolist()) & set(
            np.asarray(i_exact)[r].tolist())
        # bin collisions + query-quantization rank flips near the boundary
        assert len(overlap) >= K - 2
    # scores agree to int8 precision on the common hits
    np.testing.assert_allclose(
        np.asarray(s_fused)[:, 0], np.asarray(s_exact)[:, 0],
        rtol=2e-2, atol=5e-1)


def test_fused_large_batch_query_blocking(rng):
    """Q > _QBLOCK exercises the 2D grid (query-block axis)."""
    vecs, codes, scale, sqnorm = _store(rng, n=2048)
    q = rng.standard_normal((520, D)).astype(np.float32)
    valid = jnp.ones((2048,), bool)
    s_exact, i_exact = scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=1)
    s_fused, i_fused = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=1)
    match = (np.asarray(i_fused)[:, 0] == np.asarray(i_exact)[:, 0]).mean()
    assert match > 0.95  # top-1 is bin-collision-free by construction


def test_fused_respects_tombstones(rng):
    vecs, codes, scale, sqnorm = _store(rng)
    q = vecs[7:8]
    valid = np.ones(N, bool)
    valid[7] = False  # tombstone the self-match
    s, i = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, jnp.asarray(valid), k=3,
        metric=Metric.COSINE)
    assert 7 not in np.asarray(i)[0].tolist()


def test_fused_zero_dot_winners_keep_ids(rng):
    """Regression (ADVICE r1): bin winners with score exactly 0.0 used to
    pack to f32 *denormals* whose only set bits were the slice index —
    TPU flush-to-zero would erase them and fabricate row ids. The packing
    now biases every valid score up to ~bias magnitude (never denormal)
    and reduces in int32 lanes; ids must survive a corpus where every
    winner's raw score is exactly 0.0 (orthogonal rows) and every other
    row scores negative."""
    n, d = 2048, 128
    q = np.zeros((1, d), np.float32)
    q[0, 0] = 1.0
    vecs = np.zeros((n, d), np.float32)
    vecs[:, 0] = -0.5        # dot with q strictly negative
    vecs[:, 1] = 1.0
    planted = [3, BIN_ROWS + 7, 5 * BIN_ROWS + 11, 900, 2047]
    for slot in planted:
        vecs[slot, 0] = 0.0  # dot exactly 0.0 -> packed val exactly 0.0
    codes = jnp.asarray(vecs)  # f32 codes: dots stay exact
    sqnorm = jnp.sum(codes * codes, axis=1)
    valid = jnp.ones((n,), bool)
    s, i = fused_scan_topk(
        jnp.asarray(q), codes, None, sqnorm, valid, k=len(planted),
        metric=Metric.COSINE, final="exact")
    assert set(np.asarray(i)[0].tolist()) == set(planted)
    # cosine 0 -> normalized score 50 on the 0-100 scale
    np.testing.assert_allclose(np.asarray(s)[0], 50.0, atol=1e-3)


def test_fused_approx_bitcast_matches_exact(rng):
    """The final="approx" leg selects over the int32 monotone keys through
    a bitcast f32 *view* (valid keys are bit patterns of normal positive
    floats thanks to the score bias — float order == int order, all 32
    bits preserved). On CPU ApproxTopK lowers to an exact selection, so
    approx and exact must return IDENTICAL ids and scores — including
    negative raw scores (biased positive before packing) and tombstoned
    rows (penalty keys, which stay negative). The r02 regression this
    replaces value-converted the keys to f32, losing the low ~8 bits
    (recall -0.005 at 1M x 768, BENCH_r01 vs BENCH_r02)."""
    from coltt_tpu.ops.scan_pallas import fused_scan_neg_topk

    n, d = 8192, 128
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    # make half the corpus anti-correlated so top-k includes negative
    # cosine similarities for some queries
    vecs[n // 2:] *= -1.0
    codes = jnp.asarray(vecs)
    sqnorm = jnp.sum(codes * codes, axis=1)
    valid = np.ones(n, bool)
    valid[::7] = False
    q = rng.standard_normal((9, d)).astype(np.float32)
    kwargs = dict(k=32, metric=Metric.COSINE)
    ne, ie = fused_scan_neg_topk(
        jnp.asarray(q), codes, None, sqnorm, jnp.asarray(valid),
        final="exact", **kwargs)
    na, ia = fused_scan_neg_topk(
        jnp.asarray(q), codes, None, sqnorm, jnp.asarray(valid),
        final="approx", **kwargs)
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ia))
    np.testing.assert_array_equal(np.asarray(ne), np.asarray(na))


def test_unit_i8_rejects_wide_dims(rng):
    """dim > 2048 overflows the <<5 packing — must refuse, not corrupt."""
    from coltt_tpu.ops.scan_pallas import fused_unit_i8_neg_topk

    codes = jnp.zeros((2048, 2176), jnp.int8)
    q = jnp.zeros((1, 2176), jnp.float32)
    live = jnp.ones((2048 // BIN_ROWS * 2,), bool)
    with pytest.raises(ValueError, match="unsupported"):
        fused_unit_i8_neg_topk(q, codes, jnp.float32(1.0), live, k=3)


def test_fused_all_invalid(rng):
    vecs, codes, scale, sqnorm = _store(rng)
    q = vecs[:2]
    valid = jnp.zeros((N,), bool)
    s, i = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=3, metric=Metric.COSINE)
    assert np.isneginf(np.asarray(s)).all()


def test_slot_plan_shapes():
    """1M-row serving shape (padded to 8192 quanta): nbins = 31488 must
    split into 41 lane-aligned members of width 768."""
    from coltt_tpu.ops.scan_pallas import _slot_plan

    assert _slot_plan(31488) == (41, 768)       # 1,007,616 rows / bin 32
    s, w = _slot_plan(16384)
    assert s * w == 16384 and w % 128 == 0
    assert _slot_plan(7) is None


def test_fused_slot2_matches_exact_on_planted(rng):
    """slot2 keeps two survivors per strided slot: planted hits in
    distinct bins AND distinct slots must come back exactly."""
    vecs, codes, scale, sqnorm = _store(rng)
    q = rng.standard_normal((3, D)).astype(np.float32)
    valid = jnp.ones((N,), bool)
    planted = [17, BIN_ROWS * 5 + 3, BIN_ROWS * 20, BIN_ROWS * 40 + 99,
               BIN_ROWS * 60 + 1]
    v2 = vecs.copy()
    for j, slot in enumerate(planted):
        v2[slot] = q[0] * (1.0 + 0.01 * j)
    codes, scale = quantize(jnp.asarray(v2), Quantization.F8)
    deq = dequantize(codes, scale)
    sqnorm = jnp.sum(deq * deq, axis=1)

    s_ex, i_ex = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K,
        metric=Metric.COSINE, final="exact")
    s_s2, i_s2 = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K,
        metric=Metric.COSINE, final="slot2")
    assert set(np.asarray(i_s2)[0].tolist()) == set(planted)
    # member-tag injection perturbs values by ~2^-12 of the bias only
    np.testing.assert_allclose(
        np.asarray(s_s2)[0], np.asarray(s_ex)[0], rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("metric", [Metric.COSINE, Metric.EUCLIDEAN])
def test_fused_slot2_overlap_on_random(rng, metric):
    """On random data slot2 may lose an item only to a double collision
    inside one slot — overwhelmingly unlikely at these sizes."""
    vecs, codes, scale, sqnorm = _store(rng)
    q = rng.standard_normal((4, D)).astype(np.float32)
    valid = jnp.ones((N,), bool)
    _, i_ex = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric,
        final="exact")
    _, i_s2 = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=K, metric=metric,
        final="slot2")
    for r in range(4):
        overlap = set(np.asarray(i_s2)[r].tolist()) & set(
            np.asarray(i_ex)[r].tolist())
        assert len(overlap) >= K - 1


def test_fused_slot2_tombstones_and_ids(rng):
    """Tombstoned rows must never surface through slot2 (their penalty
    keys stay hugely negative through the member-tag injection)."""
    vecs, codes, scale, sqnorm = _store(rng)
    q = vecs[7:8]
    valid = np.ones(N, bool)
    valid[7] = False
    s, i = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, jnp.asarray(valid), k=3,
        metric=Metric.COSINE, final="slot2")
    assert 7 not in np.asarray(i)[0].tolist()


def test_fused_slot2_wide_k_falls_back(rng):
    """k wider than the reduced slot2 set must fall back to exact, not
    crash or truncate."""
    vecs, codes, scale, sqnorm = _store(rng, n=2048)  # nbins = 128 -> width 4
    q = rng.standard_normal((2, D)).astype(np.float32)
    valid = jnp.ones((2048,), bool)
    s_ex, i_ex = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=64, final="exact")
    s_s2, i_s2 = fused_scan_topk(
        jnp.asarray(q), codes, scale, sqnorm, valid, k=64, final="slot2")
    np.testing.assert_array_equal(np.asarray(i_ex), np.asarray(i_s2))


def test_unit_i8_slot2_matches_exact(rng):
    """Unit-norm int8 path: slot2 vs exact on planted data — identical id
    sets (dots perturbed only in the low member bits)."""
    from coltt_tpu.ops.scan_pallas import (
        fused_unit_i8_neg_topk, unit_i8_bin_live, chunk_for,
    )

    n, d = 8192, 128
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    planted = [5, BIN_ROWS * 9 + 2, BIN_ROWS * 33, BIN_ROWS * 71 + 8]
    for j, slot in enumerate(planted):
        vecs[slot] = q[0] * (2.0 + 0.05 * j)
    un = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    gscale = jnp.float32(np.abs(un).max() / 127.0)
    codes = jnp.asarray(np.round(un / float(gscale)).clip(-127, 127),
                        jnp.int8)
    live = jnp.asarray(unit_i8_bin_live(np.ones(n, bool), chunk_for(n)))
    ne, ie = fused_unit_i8_neg_topk(
        jnp.asarray(q), codes, gscale, live, k=len(planted), final="exact")
    ns, is_ = fused_unit_i8_neg_topk(
        jnp.asarray(q), codes, gscale, live, k=len(planted), final="slot2")
    assert set(np.asarray(is_)[0].tolist()) == set(planted)
    assert set(np.asarray(ie)[0].tolist()) == set(planted)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ne),
                               rtol=1e-3, atol=1e-3)

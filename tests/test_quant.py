"""Quantization fidelity contract.

Mirrors the reference's ``pkg/compresshelper/compresshelper_test.go:39-414``:
for random vector pairs at every dim the reference tests, the normalized
cosine score (0-100) computed on dequantized vectors must be within 1.0
point of the fp32 score. This is the load-bearing invariant the reference
enforces (SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from coltt_tpu.ops.distance import Metric, pairwise_distance
from coltt_tpu.ops.quant import Quantization, dequantize, quantize, storage_dtype
from coltt_tpu.ops.score import normalize_score

DIMS = [128, 384, 768, 1536, 3072]
PAIRS = 256


def _score(x, y):
    d = pairwise_distance(x[None, :], y[None, :], Metric.COSINE)[0, 0]
    return float(normalize_score(d, Metric.COSINE))


@pytest.mark.parametrize(
    "q",
    [Quantization.F16, Quantization.BF16, Quantization.F8, Quantization.I8],
)
@pytest.mark.parametrize("dim", DIMS)
def test_cosine_score_delta_under_one_point(q, dim, rng):
    xs = rng.standard_normal((PAIRS, dim), dtype=np.float32)
    ys = rng.standard_normal((PAIRS, dim), dtype=np.float32)
    cx, sx = quantize(xs, q)
    cy, sy = quantize(ys, q)
    dx = np.asarray(dequantize(cx, sx))
    dy = np.asarray(dequantize(cy, sy))

    d_exact = np.asarray(pairwise_distance(xs, ys, Metric.COSINE))
    d_quant = np.asarray(pairwise_distance(dx, dy, Metric.COSINE))
    s_exact = ((2.0 - np.diag(d_exact)) / 2.0) * 100.0
    s_quant = ((2.0 - np.diag(d_quant)) / 2.0) * 100.0
    delta = np.abs(s_exact - s_quant).max()
    assert delta <= 1.0, f"{q.name} dim={dim}: max score delta {delta}"


def _row_scores(x, y):
    """Per-pair normalized cosine scores, vectorized over rows."""
    dots = np.einsum("nd,nd->n", x, y, dtype=np.float64)
    nx = np.linalg.norm(x.astype(np.float64), axis=1)
    ny = np.linalg.norm(y.astype(np.float64), axis=1)
    d = 1.0 - dots / np.maximum(nx * ny, 1e-30)
    return ((2.0 - d) / 2.0) * 100.0


@pytest.mark.slow
@pytest.mark.parametrize(
    "q",
    [Quantization.F16, Quantization.BF16, Quantization.F8, Quantization.I8],
)
@pytest.mark.parametrize("dim", DIMS)
def test_cosine_contract_statistical(q, dim, rng):
    """The reference's full statistical contract: 100k+ random pairs per
    (codec x dim) with max |score delta| <= 1.0 on the 0-100 scale
    (compresshelper_test.go:39-414 runs 1M pairs; 100k gives the same
    tail power to ~3x rarer events and keeps the suite's slow lane
    tractable — the 256-pair fast test above guards per-commit)."""
    total, chunk = 100_000, 16_384
    worst = 0.0
    done = 0
    while done < total:
        n = min(chunk, total - done)
        xs = rng.standard_normal((n, dim), dtype=np.float32)
        ys = rng.standard_normal((n, dim), dtype=np.float32)
        cx, sx = quantize(xs, q)
        cy, sy = quantize(ys, q)
        dx = np.asarray(dequantize(cx, sx))
        dy = np.asarray(dequantize(cy, sy))
        delta = np.abs(_row_scores(xs, ys) - _row_scores(dx, dy)).max()
        worst = max(worst, float(delta))
        assert worst <= 1.0, (
            f"{q.name} dim={dim}: max score delta {worst} after "
            f"{done + n} pairs"
        )
        done += n


@pytest.mark.parametrize(
    "q",
    [Quantization.NONE, Quantization.F16, Quantization.BF16, Quantization.F8,
     Quantization.I8],
)
def test_roundtrip_shape_and_dtype(q, rng):
    x = rng.standard_normal((10, 64), dtype=np.float32)
    codes, scale = quantize(x, q)
    assert codes.dtype == storage_dtype(q)
    assert codes.shape == (10, 64)
    assert scale.shape == (10, 1)
    out = np.asarray(dequantize(codes, scale))
    rel = np.abs(out - x).max() / np.abs(x).max()
    tol = {"NONE": 0.0, "F16": 1e-3, "BF16": 1e-1, "F8": 0.2, "I8": 0.05}[q.name]
    assert rel <= tol


def test_none_is_exact(rng):
    x = rng.standard_normal((4, 32), dtype=np.float32)
    codes, scale = quantize(x, Quantization.NONE)
    np.testing.assert_array_equal(np.asarray(dequantize(codes, scale)), x)


def test_f8_zero_row_safe():
    x = np.zeros((2, 16), np.float32)
    codes, scale = quantize(x, Quantization.F8)
    out = np.asarray(dequantize(codes, scale))
    np.testing.assert_array_equal(out, x)
    assert np.all(np.isfinite(np.asarray(scale)))


def test_f8_storage_is_one_byte():
    assert jnp.dtype(storage_dtype(Quantization.F8)).itemsize == 1
    assert jnp.dtype(storage_dtype(Quantization.F16)).itemsize == 2
    assert jnp.dtype(storage_dtype(Quantization.BF16)).itemsize == 2

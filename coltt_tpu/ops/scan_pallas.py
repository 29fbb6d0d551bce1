"""Pallas fused scan+top-k kernel: the speed-of-light FLAT search path.

Reference parity: this is the TPU replacement for the reference's hottest
loop — the full FLAT scan with per-shard bounded heaps
(``edge/f16_vectorstore.go:131-187`` VertexSearch + goroutine fan-out,
``pkg/distance/simd`` AVX kernels). BASELINE.md's best published number
for it is 20-30 ms over 1M x 128d on 16 cores.

Why a kernel instead of XLA: the jnp scan (ops/topk.py) materializes the
``[Q, N]`` f32 score matrix in HBM — at Q=512, N=1M that is 2 GB of HBM
write+read per batch, several times the size of the (f8) corpus itself —
and then runs a full sort-based top_k over it. This kernel keeps each
score tile in VMEM, reduces it to per-bin (128 rows) maxima+argmaxima on
the VPU, and emits only ``[Q, N/128]`` candidates (256x less HBM), which a
tiny ``lax.top_k`` finishes off.

The reduction is approximate in the same sense as XLA's ApproxTopK /
the TPU-KNN recipe (arXiv:2206.14286): one candidate per 128-row bin, so
two true top-k rows colliding in one bin lose the weaker one. For k=10,
N=1M the expected recall impact is <0.5% (collision probability
~ C(k,2)*bin/N); stores keep the exact XLA path as default and expose
this as the ``approx`` search mode.

Kernel shape rules: D % 128 == 0, N % chunk == 0 (stores allocate in 8192
quanta), queries padded to a multiple of 8 rows. Cosine and (squared)
euclidean only — both reduce to one MXU contraction with a per-row FMA
epilogue folded in (scale, rsqrt-norm, tombstone penalty).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coltt_tpu.ops.distance import Metric
from coltt_tpu.ops.score import normalize_score

BIN_ROWS = 128  # rows per candidate bin (one survivor per bin)
_CHUNK = 2048   # rows per grid step: [Q, chunk] f32 scores stay in VMEM


def _kernel(q_ref, c_ref, rowmul_ref, rowadd_ref, qmul_ref, qadd_ref,
            vals_ref, ids_ref, *, compute_dtype, chunk):
    """One grid step: score `chunk` rows, keep per-128-row-bin max+argmax."""
    i = pl.program_id(0)
    dots = lax.dot_general(
        q_ref[:].astype(compute_dtype),
        c_ref[:].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Qp, chunk]
    # ranking value (= negated distance up to a per-query constant):
    #   cosine:  dots * scale * rsqrt(vnorm) * qinv          (+ -inf penalty)
    #   euclid:  2 * dots * scale - vnorm - qsq              (+ -inf penalty)
    val = dots * rowmul_ref[:] * qmul_ref[:] + rowadd_ref[:] + qadd_ref[:]

    qp = val.shape[0]
    bins = chunk // BIN_ROWS
    v3 = val.reshape(qp, bins, BIN_ROWS)
    bmax = jnp.max(v3, axis=2)  # [Qp, bins]
    eq = v3 == bmax[:, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, (qp, bins, BIN_ROWS), 2)
    bidx = jnp.min(jnp.where(eq, lane, BIN_ROWS), axis=2)  # [Qp, bins]
    base = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (qp, bins), 1) * BIN_ROWS
    # outputs are [bins, Qp] (transposed): Mosaic requires output blocks of
    # >=(8, 128) and bins-per-chunk is only 16 — Qp in the lane dim is legal
    vals_ref[:] = bmax.T
    ids_ref[:] = (base + bidx).T


@functools.partial(
    jax.jit, static_argnames=("metric", "compute_dtype", "chunk"),
)
def _binmax_scan(queries, codes, rowmul, rowadd, qmul, qadd, *,
                 metric, compute_dtype, chunk):
    qp, d = queries.shape
    n = codes.shape[0]
    bins_per_chunk = chunk // BIN_ROWS
    nchunks = n // chunk
    nbins = n // BIN_ROWS

    grid_spec = pl.GridSpec(
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bins_per_chunk, qp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_per_chunk, qp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _kernel, compute_dtype=compute_dtype, chunk=chunk
    )
    vals_t, ids_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # CPU (test) backend runs the kernel interpreted; TPU compiles Mosaic
        interpret=jax.default_backend() == "cpu",
        out_shape=[
            jax.ShapeDtypeStruct((nbins, qp), jnp.float32),
            jax.ShapeDtypeStruct((nbins, qp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d * n,
            bytes_accessed=n * d * codes.dtype.itemsize + qp * d * 4,
            transcendentals=0,
        ),
    )(queries, codes, rowmul, rowadd, qmul, qadd)
    return vals_t.T, ids_t.T


def supports(n: int, dim: int, metric, dtype) -> bool:
    """Whether the fused kernel handles this store shape."""
    metric = Metric.parse(metric)
    return (
        metric in (Metric.COSINE, Metric.EUCLIDEAN)
        and dim % 128 == 0
        and n % _CHUNK == 0
        and dtype != jnp.float16  # no f16 MXU path
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "compute_dtype"),
)
def fused_scan_neg_topk(
    queries,
    codes,
    scale,
    sqnorm,
    valid,
    *,
    k: int,
    metric: Metric = Metric.COSINE,
    compute_dtype=jnp.bfloat16,
):
    """Fused approximate top-k: ``(negdist [Q,k], ids [Q,k])``.

    Drop-in for :func:`coltt_tpu.ops.topk.scan_neg_topk` where
    :func:`supports` holds. Ranking values are transformed back to the
    same negated-distance convention so multi-device merges compose.
    """
    metric = Metric.parse(metric)
    queries = jnp.asarray(queries, jnp.float32)
    q, d = queries.shape
    n = codes.shape[0]

    qp = -(-q // 8) * 8
    if qp != q:
        queries = jnp.pad(queries, [(0, qp - q), (0, 0)])

    scale_row = (jnp.ones((n,), jnp.float32) if scale is None
                 else scale.reshape(n))
    penalty = jnp.where(valid, 0.0, -jnp.inf) if valid is not None else (
        jnp.zeros((n,), jnp.float32))
    if metric == Metric.COSINE:
        rowmul = scale_row * jax.lax.rsqrt(jnp.maximum(sqnorm, 1e-30))
        rowadd = penalty
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=1, keepdims=True))
        qmul = 1.0 / jnp.maximum(qn, 1e-30)
        qadd = jnp.zeros((qp, 1), jnp.float32)
    else:  # EUCLIDEAN (squared)
        rowmul = 2.0 * scale_row
        rowadd = penalty - sqnorm
        qmul = jnp.ones((qp, 1), jnp.float32)
        qadd = -jnp.sum(queries * queries, axis=1, keepdims=True)

    vals, ids = _binmax_scan(
        queries, codes, rowmul.reshape(1, n), rowadd.reshape(1, n),
        qmul, qadd, metric=metric, compute_dtype=compute_dtype, chunk=_CHUNK,
    )
    kk = min(k, vals.shape[1])
    best, pos = lax.top_k(vals, kk)  # [qp, kk] over N/128 candidates
    ids = jnp.take_along_axis(ids, pos, axis=1)

    # back to negated-distance convention (merge-compatible with ops.topk)
    if metric == Metric.COSINE:
        negd = best - 1.0  # val = cos_sim -> -dist = cos_sim - 1
    else:
        negd = best  # val = -(squared euclidean) already
    negd = jnp.where(jnp.isfinite(best), negd, -jnp.inf)
    return negd[:q], ids[:q].astype(jnp.int32)


def fused_scan_topk(
    queries, codes, scale, sqnorm, valid, *, k,
    metric: Metric = Metric.COSINE, compute_dtype=jnp.bfloat16,
):
    """0-100-scored variant (scan_topk parity)."""
    metric = Metric.parse(metric)
    negd, idx = fused_scan_neg_topk(
        queries, codes, scale, sqnorm, valid, k=k, metric=metric,
        compute_dtype=compute_dtype,
    )
    score = jnp.where(jnp.isinf(negd), -jnp.inf, normalize_score(-negd, metric))
    return score, idx

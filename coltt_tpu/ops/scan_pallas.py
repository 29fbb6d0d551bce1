"""Pallas fused scan+top-k kernel: the speed-of-light FLAT search path.

Reference parity: this is the TPU replacement for the reference's hottest
loop — the full FLAT scan with per-shard bounded heaps
(``edge/f16_vectorstore.go:131-187`` VertexSearch + goroutine fan-out,
``pkg/distance/simd`` AVX kernels). BASELINE.md's best published number
for it is 20-30 ms over 1M x 128d on 16 cores.

Why a kernel instead of XLA: the jnp scan (ops/topk.py) materializes the
``[Q, N]`` f32 score matrix in HBM — at Q=2048, N=1M that is 8 GB of HBM
write+read per batch, several times the size of the (int8) corpus itself.
This kernel keeps each score tile in VMEM and reduces it on the VPU to one
``(max, argmax)`` survivor per 16-row bin, so only ``[Q, N/16]`` candidates
ever reach HBM (64x less); a small selection pass finishes off.

Three design rules keep the kernel on the hardware's fast paths (each
measured on v5e at Q=2048, N=1M, D=768):

- **int8 codes take the int8 MXU path** (2x the bf16 rate — 8 ms vs 16 ms
  matmul floor): the dot runs s8 x s8 -> s32 and both quantization scales
  fold into one f32 FMA.
- **no cross-lane reductions in the epilogue.** The bin reduction is a
  compare/select loop over 16 slices of 128 lanes — pure elementwise VPU
  work (~4.8 ms). The "obvious" formulation (reshape to [..., 128] bins +
  max/argmax along the lane axis) costs 30+ ms in shuffle cascades.
- **per-query factors leave the kernel**: anything affine per query
  (query norm, query squared-norm, the int8 query scale) preserves ranking
  within that query, so it is applied to the ``[Q, k]`` winners after the
  final selection instead of to all ``[Q, N]`` scores. For the euclidean
  int8 path the query scale must multiply only the dot term, so there the
  whole batch shares one scalar query scale (folded into the per-row
  multiplier) rather than per-query scales.

The reduction is approximate in the same sense as XLA's ApproxTopK /
the TPU-KNN recipe (arXiv:2206.14286): one survivor per 16-row bin, so two
true top-k rows colliding in one bin lose the weaker one (pair collision
probability 16/N — at k=10, N=1M the expected recall impact is <0.1%).
``final="approx"`` additionally selects over the [Q, N/16] survivors with
XLA's ApproxTopK (another ~2x end-to-end; default at serving sizes), while
``final="exact"`` runs a full ``lax.top_k``. Stores keep the exact XLA
path as default and expose this kernel as the ``fused`` search mode.

Kernel shape rules: D % 128 == 0, N % chunk (2048) == 0 (stores allocate
in 8192 quanta), queries padded per the block size below. Cosine and
(squared) euclidean only — both reduce to one MXU contraction with a
per-row FMA epilogue folded in (scale, rsqrt-norm, tombstone penalty).
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

BIN_ROWS = 16     # rows per candidate bin (one survivor per bin)
_LANES = 128      # survivors per chunk = lanes of the reduction tile
_CHUNK = 2048     # rows per grid step: [qblock, chunk] f32 scores in VMEM
_QBLOCK = 512     # max query rows per grid step (512*2048*4 = 4 MB scores)


def _kernel(q_ref, c_ref, rowmul_ref, rowadd_ref, vals_ref, ids_ref, *,
            compute_dtype, chunk):
    """One grid step: score a [qblock, chunk] tile, keep per-bin max+argmax.

    ``rowmul``/``rowadd`` are per-row (corpus) factors; per-query factors
    are applied by the caller after the final top-k (see module docstring).
    The bin reduction runs as an elementwise compare/select over the 16
    column slices — never across lanes.
    """
    i = pl.program_id(0)
    if c_ref.dtype == jnp.int8:
        dots = lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [qblock, chunk]
    else:
        dots = lax.dot_general(
            q_ref[:].astype(compute_dtype),
            c_ref[:].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    val = dots * rowmul_ref[:] + rowadd_ref[:]

    qb = val.shape[0]
    m = val[:, :_LANES]
    a = jnp.zeros((qb, _LANES), jnp.int32)
    for s in range(1, chunk // _LANES):
        sl = val[:, s * _LANES:(s + 1) * _LANES]
        upd = sl > m
        m = jnp.where(upd, sl, m)
        a = jnp.where(upd, s, a)
    lane = lax.broadcasted_iota(jnp.int32, (qb, _LANES), 1)
    # outputs are [lanes, qb] (transposed): Mosaic wants >=(8, 128) blocks
    # and qb in the lane dim keeps the store legal for any qb >= 8
    vals_ref[:] = m.T
    ids_ref[:] = (i * chunk + a * _LANES + lane).T


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "chunk", "qblock"),
)
def _binmax_scan(queries, codes, rowmul, rowadd, *,
                 compute_dtype, chunk, qblock):
    """Grid scan -> per-bin (max, argmax): ([qp, nbins], [qp, nbins]).

    Grid is (row chunks, query blocks) with query blocks minor, so each
    codes tile is fetched from HBM once and reused across all query blocks.
    """
    qp, d = queries.shape
    n = codes.shape[0]
    nchunks = n // chunk
    nbins = n // BIN_ROWS
    qblocks = qp // qblock

    grid_spec = pl.GridSpec(
        grid=(nchunks, qblocks),
        in_specs=[
            pl.BlockSpec((qblock, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_LANES, qblock), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES, qblock), lambda i, j: (i, j),
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
    )(queries, codes, rowmul, rowadd)
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


def _pick_qblock(q: int, align: int) -> tuple[int, int]:
    """(padded q, block) — blocks of <=_QBLOCK rows, aligned, dividing qp."""
    blocks = -(-q // _QBLOCK)
    per_block = -(-q // blocks)
    qblock = -(-per_block // align) * align
    return blocks * qblock, qblock


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "compute_dtype", "final"),
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
    final: str = "auto",
):
    """Fused approximate top-k: ``(negdist [Q,k], ids [Q,k])``.

    Drop-in for :func:`coltt_tpu.ops.topk.scan_neg_topk` where
    :func:`supports` holds. Ranking values are transformed back to the
    same negated-distance convention so multi-device merges compose.
    int8 codes run on the int8 MXU path (queries quantized on the fly).
    ``final``: selection over the [Q, N/16] bin survivors — "exact"
    (lax.top_k), "approx" (ApproxTopK), or "auto" (approx at serving
    sizes, exact for small stores).
    """
    metric = Metric.parse(metric)
    queries = jnp.asarray(queries, jnp.float32)
    q, d = queries.shape
    n = codes.shape[0]
    int8 = codes.dtype == jnp.int8

    qp, qblock = _pick_qblock(q, 32 if int8 else 8)
    if qp != q:
        queries = jnp.pad(queries, [(0, qp - q), (0, 0)])

    scale_row = (jnp.ones((n,), jnp.float32) if scale is None
                 else scale.reshape(n))
    penalty = jnp.where(valid, 0.0, -jnp.inf) if valid is not None else (
        jnp.zeros((n,), jnp.float32))

    if int8:
        if metric == Metric.COSINE:
            # per-query symmetric int8; qscale is per-query -> post-affine
            qmax = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
            qscale = jnp.where(qmax > 0, qmax / 127.0, 1.0)
            qkern = jnp.round(queries / qscale).clip(-127, 127).astype(jnp.int8)
        else:
            # euclidean: qscale multiplies only the dot term, not -|v|^2,
            # so it cannot leave the kernel per query — share one scalar
            gmax = jnp.max(jnp.abs(queries))
            gscale = jnp.where(gmax > 0, gmax / 127.0, 1.0)
            qkern = jnp.round(queries / gscale).clip(-127, 127).astype(jnp.int8)
    else:
        qkern = queries

    if metric == Metric.COSINE:
        rowmul = scale_row * jax.lax.rsqrt(jnp.maximum(sqnorm, 1e-30))
        rowadd = penalty
        qn = jnp.maximum(
            jnp.sqrt(jnp.sum(queries * queries, axis=1, keepdims=True)), 1e-30
        )
        qmul = (qscale / qn) if int8 else (1.0 / qn)   # [qp, 1]
        qadd = jnp.float32(-1.0)  # val*qmul = cos_sim -> -dist = cos_sim - 1
    else:  # EUCLIDEAN (squared): val = 2*dot*scale - |v|^2 (+penalty)
        rowmul = 2.0 * scale_row * (gscale if int8 else 1.0)
        rowadd = penalty - sqnorm
        qmul = jnp.ones((qp, 1), jnp.float32)
        qadd = -jnp.sum(queries * queries, axis=1, keepdims=True)  # -> -dist

    vals, ids = _binmax_scan(
        qkern, codes, rowmul.reshape(1, n), rowadd.reshape(1, n),
        compute_dtype=compute_dtype, chunk=_CHUNK, qblock=qblock,
    )
    kk = min(k, vals.shape[1])
    if final == "auto":
        final = "approx" if vals.shape[1] > 8192 else "exact"
    if final == "approx" and kk < vals.shape[1]:
        best, pos = lax.approx_max_k(vals, kk, recall_target=0.95)
    else:
        best, pos = lax.top_k(vals, kk)  # [qp, kk] over N/16 candidates
    ids = jnp.take_along_axis(ids, pos, axis=1)

    # per-query affine back to the negated-distance convention (qmul > 0,
    # so ranking within each query is unchanged; merges stay compatible)
    negd = best * qmul + qadd
    negd = jnp.where(jnp.isfinite(best), negd, -jnp.inf)
    return negd[:q], ids[:q].astype(jnp.int32)


def fused_scan_topk(
    queries, codes, scale, sqnorm, valid, *, k,
    metric: Metric = Metric.COSINE, compute_dtype=jnp.bfloat16,
    final: str = "auto",
):
    """0-100-scored variant (scan_topk parity)."""
    metric = Metric.parse(metric)
    negd, idx = fused_scan_neg_topk(
        queries, codes, scale, sqnorm, valid, k=k, metric=metric,
        compute_dtype=compute_dtype, final=final,
    )
    score = jnp.where(jnp.isinf(negd), -jnp.inf, normalize_score(-negd, metric))
    return score, idx

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
survivor per bin (16 or 32 rows), so only ``[Q, N/bin]`` words ever
reach HBM (64-128x less); a small selection pass finishes off. The
survivor is a single packed int32 *monotone key*, built by **biasing the
score positive before packing**: a bias ``B`` — a rigorous Cauchy-Schwarz
upper bound on |score|, static for the int8 cosine path, a cheap traced
reduction otherwise — rides in ``rowadd``, so every valid score lands in
``(0, 2B]``. For positive f32 values the raw bit pattern already orders
like the value, so the key is just ``bitcast(score + B)`` with the bin's
slice index replacing the low mantissa bits (a ~2^-18-of-B absolute
perturbation, far below quantization error). The reduction is a plain
integer ``maximum`` tree, the kernel writes ONE output instead of a
(vals, ids) pair, and the winner's row id is reconstructed bit-wise after
the final top-k — no [Q, N/bin] id array, no gather.

The bias serves two masters at once. (1) *Speed*: making keys monotone
without it needs the sign-fold involution (``b ^ ((b >> 31) &
0x7fffffff)``) on every [Q, N] element — measured ~3 extra VPU ops per
element = the r02 regression's −10.8% QPS at 1M x 768 (BENCH_r01 vs
BENCH_r02); with the bias folded into ``rowadd`` the packing is the same
2 ops (and, or) the r01 kernel had. (2) *FTZ safety*: valid scores sit at
magnitude ~B — never denormal — and tombstones sit at ~-3e38, so neither
the integer kernel lanes nor the f32 view the final selection consumes
can flush a value to zero and fabricate a row id (the hazard ADVICE.md
r1 flagged; see also ops/topk.py fetch_scores_ids). Keys stay in int32
lanes through the kernel and HBM as belt-and-braces.

Three design rules keep the kernel on the hardware's fast paths (each
measured on v5e at Q=2048, N=1M, D=768):

- **int8 codes take the int8 MXU path** (2x the bf16 rate — 8 ms vs 16 ms
  matmul floor): the dot runs s8 x s8 -> s32 and both quantization scales
  fold into one f32 FMA.
- **no cross-lane reductions in the epilogue.** The bin reduction is a
  pack+maximum loop over the chunk's 128-lane slices — pure elementwise
  VPU work. The "obvious" formulation (reshape to [..., 128] bins +
  max/argmax along the lane axis) costs 30+ ms in shuffle cascades, and
  the earlier (max, argmax) compare/select pair costs an extra output
  stream; packing the slice index into the mantissa keeps it to one.
- **per-query factors leave the kernel**: anything affine per query
  (query norm, query squared-norm, the int8 query scale) preserves ranking
  within that query, so it is applied to the ``[Q, k]`` winners after the
  final selection instead of to all ``[Q, N]`` scores. For the euclidean
  int8 path the query scale must multiply only the dot term, so there the
  whole batch shares one scalar query scale (folded into the per-row
  multiplier) rather than per-query scales.

The reduction is approximate in the same sense as XLA's ApproxTopK /
the TPU-KNN recipe (arXiv:2206.14286): one survivor per bin, so two
true top-k rows colliding in one bin lose the weaker one (pair collision
probability bin/N — at k=10, bin=32, N=1M the expected recall impact is
<0.2%, recovered by the rerank stage's oversampling).
The final selection over the [Q, N/bin] survivors is, at serving sizes,
the *two-survivors-per-strided-slot* pass (``_slot2_select``): slots of
S strided columns each keep their best two members (a pure aligned-VPU
min/max cascade), and one exact ``lax.top_k`` finishes over the
[Q, 2*nb/S] survivors. An item is lost only when TWO better items share
its slot (miss ~ (rank*S/nb)^2/2 ~ 1e-3 at shortlist rank 40) — vs
~rank/2048 for single-call ApproxTopK's one-survivor reduction, the r03
recall regression. Exact ``lax.top_k`` over all survivors is the recall
ceiling but costs as much as the scan itself (XLA's sort: measured
+11 ms at [2048, 31250] — do NOT trust block_until_ready timings through
the relay; only end-to-end QPS); ``final="exact"`` remains for small
stores and ground-truthing, ``"approx"``/``"approx2"`` for the measured
frontier's other points.
Stores keep the exact XLA path as default and expose this kernel as the
``fused`` search mode.

Kernel shape rules: D % 128 == 0, N % chunk == 0 where chunk is 4096 when
N allows it, else 2048 (stores allocate in 8192 quanta so production
stores always take the 4096 path), queries padded per the block size
below. Cosine and (squared) euclidean only — both reduce to one MXU
contraction with a per-row FMA epilogue folded in (scale, rsqrt-norm,
tombstone penalty).
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

BIN_ROWS = 32     # max rows per candidate bin (chunk // _LANES; 16 at
                  # chunk=2048, 32 at chunk=4096 — tests space plants by this)
_LANES = 128      # survivors per chunk = lanes of the reduction tile
_CHUNK = 2048     # minimum chunk (shape-rule quantum); 4096 used when N allows
_QBLOCK = 512     # max query rows per grid step


def chunk_for(n: int) -> int:
    """Row-chunk the kernels use for an N-row store: the largest supported
    chunk dividing N. Everything deriving bin order (bin_live masks, id
    reconstruction) MUST use this same rule."""
    return 2 * _CHUNK if n % (2 * _CHUNK) == 0 else _CHUNK
# tombstoned rows get a large finite negative instead of -inf (historical:
# the pre-int32-key packing ORed bits into the f32 mantissa, where
# -inf|bits is NaN; with sign-folded integer keys -inf would now be safe,
# but finite keeps the unpack contract simple). Anything below
# _INVALID_CUT is reported as -inf after selection.
# plain Python floats, NOT jnp scalars: a module-level jnp constant
# initializes the XLA backend at import, which breaks
# jax.distributed.initialize in multi-process programs
_PENALTY = -3.0e38
_INVALID_CUT = -1.0e30


def _kernel(q_ref, c_ref, rowmul_ref, rowadd_ref, out_ref, *,
            compute_dtype, chunk):
    """One grid step: score a [qblock, chunk] tile, keep one packed
    survivor per bin.

    ``rowmul``/``rowadd`` are per-row (corpus) factors; per-query factors
    are applied by the caller after the final top-k (see module docstring).
    ``rowadd`` carries the positivity bias, so every valid score's f32 bit
    pattern IS a monotone non-negative int32 key; the packing just masks
    the low mantissa bits and ORs in the 128-lane slice's index, then an
    elementwise integer ``maximum`` reduces over the slices — never across
    lanes, one output stream. Tombstone scores (~-3e38) bitcast to
    negative int32 and lose to every valid key; their order among
    themselves is scrambled, which is fine — they all fall below
    ``_INVALID_CUT`` after unpacking.
    """
    nsl = chunk // _LANES
    mask = jnp.int32(-nsl)  # clears the low log2(nsl) mantissa bits
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

    def pack(x, s):
        # biased-positive scores: raw f32 bits are already a monotone
        # non-negative int32 key (see module docstring) — 2 VPU ops.
        return (lax.bitcast_convert_type(x, jnp.int32) & mask) | s

    m = pack(val[:, :_LANES], 0)
    for s in range(1, nsl):
        m = jnp.maximum(m, pack(val[:, s * _LANES:(s + 1) * _LANES], s))
    out_ref[:] = m


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "chunk", "qblock"),
)
def _binmax_scan(queries, codes, rowmul, rowadd, *,
                 compute_dtype, chunk, qblock):
    """Grid scan -> packed per-bin max key: [qp, nbins] int32.

    Grid is (row chunks, query blocks) with query blocks minor, so each
    codes tile is fetched from HBM once and reused across all query blocks.
    Column ``c`` of the output is chunk ``c // 128``, lane ``c % 128``; the
    winning slice index is in the low mantissa bits (see module docstring).
    """
    qp, d = queries.shape
    n = codes.shape[0]
    nchunks = n // chunk
    nbins = nchunks * _LANES
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
            pl.BlockSpec((qblock, _LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _kernel, compute_dtype=compute_dtype, chunk=chunk
    )
    (vals,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # CPU (test) backend runs the kernel interpreted; TPU compiles Mosaic
        interpret=jax.default_backend() == "cpu",
        out_shape=[
            jax.ShapeDtypeStruct((qp, nbins), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d * n,
            bytes_accessed=n * d * codes.dtype.itemsize + qp * d * 4
            + qp * nbins * 4,
            transcendentals=0,
        ),
    )(queries, codes, rowmul, rowadd)
    return vals


def _slot_plan(nb: int):
    """Pick ``(members S, width)`` for the two-survivors-per-slot selection
    (``final="slot2"``): ``width`` must divide ``nb`` and be lane-aligned
    (a multiple of 128) so the member slices are pure aligned VPU work.
    Among aligned choices the largest S <= 48 wins (narrowest final sort);
    S is capped because the two-survivor loss grows ~(r*S/nb)^2/2 at
    shortlist rank r. Returns None when no usable split exists."""
    aligned = [s for s in range(8, 49) if nb % s == 0 and (nb // s) % 128 == 0]
    if aligned:
        s = max(aligned)
        return s, nb // s
    loose = [s for s in range(8, 49) if nb % s == 0]
    if loose:
        s = max(loose)
        return s, nb // s
    return None


def _slot2_select(keys, kk: int, low_bits: int, style: str = "mask"):
    """Two-survivors-per-strided-slot selection over packed int32 keys.

    The collision-loss repair for the ApproxTopK selection stage (the r03
    diagnosis: one-survivor-per-slot reduction drops true top-10 rows that
    int8 noise pushed to shortlist rank ~40, miss ~ rank/2048). Here slot
    ``c`` holds the S strided columns ``{c, c+width, ...}`` (a free
    row-major reshape) and keeps its best TWO members, so an item is lost
    only when two better items share its slot: miss ~ (r*(S-1)/nb)^2 / 2
    — ~1e-3 at rank 40 vs ~2e-2 for one-survivor budget 2048. The member
    index rides in spare low mantissa bits just above the kernel's slice
    bits (``low_bits``), a ~2^-(23-low_bits-mbits) relative perturbation,
    far below int8 storage noise — and the rerank stage re-scores the
    shortlist anyway. The final exact ``lax.top_k`` runs over only
    ``[Q, 2*width]`` survivors (width ~ nb/41 at 1M rows), not [Q, nb].

    Returns ``(sel, pos, drop_bits)``: the selected keys, their original
    bin columns, and how many low key bits are now index payload (callers
    mask them off before un-biasing the value).
    """
    qp, nb = keys.shape
    plan = _slot_plan(nb)
    if plan is None or 2 * (nb // plan[0]) < kk:
        # no usable split / shortlist wider than the reduced set: exact
        fview = lax.bitcast_convert_type(keys, jnp.float32)
        fsel, pos = lax.top_k(fview, kk)
        return lax.bitcast_convert_type(fsel, jnp.int32), pos, low_bits
    s_members, width = plan
    mbits = (s_members - 1).bit_length()
    clear = jnp.int32(~(((1 << mbits) - 1) << low_bits))
    imin = jnp.iinfo(jnp.int32).min
    km = keys.reshape(qp, s_members, width)

    def inj(s):
        return (km[:, s] & clear) | jnp.int32(s << low_bits)

    if style in ("mask", "maska"):
        # two reduction passes, no loop-carried chain: m1 = max over
        # members, m2 = max with the winner masked out. Member tags make
        # every key distinct, so exactly one element matches m1 per slot.
        tag = (jnp.arange(s_members, dtype=jnp.int32)
               << low_bits)[None, :, None]
        tagged = (km & clear) | tag
        m1 = jnp.max(tagged, axis=1)
        m2 = jnp.max(
            jnp.where(tagged == m1[:, None, :], imin, tagged), axis=1
        )
    elif style == "tree":
        # pairwise (m1, m2) merges, log2(S) dependency depth
        parts = [(inj(s), None) for s in range(s_members)]
        while len(parts) > 1:
            nxt = []
            for i in range(0, len(parts) - 1, 2):
                (a1, a2), (b1, b2) = parts[i], parts[i + 1]
                hi = jnp.maximum(a1, b1)
                lo = jnp.minimum(a1, b1)
                if a2 is not None:
                    lo = jnp.maximum(lo, a2)
                if b2 is not None:
                    lo = jnp.maximum(lo, b2)
                nxt.append((hi, lo))
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        m1, m2 = parts[0]
        if m2 is None:  # s_members == 1 can't happen (plan range), defensive
            m2 = jnp.full_like(m1, imin)
    else:  # "chain": the linear min/max cascade
        m1 = inj(0)
        m2 = jnp.full_like(m1, imin)
        for s in range(1, s_members):
            x = inj(s)
            lo = jnp.minimum(x, m1)
            m1 = jnp.maximum(x, m1)
            m2 = jnp.maximum(m2, lo)
    cand = jnp.concatenate([m1, m2], axis=1)              # [qp, 2*width]
    fcand = lax.bitcast_convert_type(cand, jnp.float32)
    if style.endswith("a"):
        # ApproxTopK tail: with budget >= the reduced width this is
        # lossless, and the op's fused reduce+sort beats raw lax.top_k
        fsel, cpos = lax.approx_max_k(fcand, kk, recall_target=0.95)
    else:
        fsel, cpos = lax.top_k(fcand, kk)
    sel = lax.bitcast_convert_type(fsel, jnp.int32)
    member = (sel >> low_bits) & ((1 << mbits) - 1)
    pos = member * width + cpos % width                   # original bin column
    return sel, pos, low_bits + mbits


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
    chunk = chunk_for(n)

    qp, qblock = _pick_qblock(q, 32 if int8 else 8)
    if qp != q:
        queries = jnp.pad(queries, [(0, qp - q), (0, 0)])

    scale_row = (jnp.ones((n,), jnp.float32) if scale is None
                 else scale.reshape(n))
    penalty = jnp.where(valid, 0.0, _PENALTY) if valid is not None else (
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
        # |val| = |dot| * scale/||deq_row|| <= ||q_kern|| by Cauchy-Schwarz
        # (||codes_row|| = ||deq_row||/scale): static 127*sqrt(d) for int8
        # queries, else the traced max query norm
        if int8:
            bound = 127.0 * float(np.sqrt(d))
        else:
            bound = jnp.sqrt(jnp.max(jnp.sum(queries * queries, axis=1)))
    else:  # EUCLIDEAN (squared): val = 2*dot*scale - |v|^2 (+penalty)
        rowmul = 2.0 * scale_row * (gscale if int8 else 1.0)
        rowadd = penalty - sqnorm
        qmul = jnp.ones((qp, 1), jnp.float32)
        qadd = -jnp.sum(queries * queries, axis=1, keepdims=True)  # -> -dist
        # |2*dot*scale_eff| <= 2*||q_kern||*||deq_row|| (Cauchy-Schwarz,
        # same norm identity as above), plus the -|v|^2 term
        maxsq = jnp.max(sqnorm)
        qn_bound = (127.0 * float(np.sqrt(d)) * gscale if int8
                    else jnp.sqrt(jnp.max(jnp.sum(queries * queries, axis=1))))
        bound = 2.0 * qn_bound * jnp.sqrt(maxsq) + maxsq
    # 2x margin covers bf16 input rounding (<1% each side) and the f32
    # FMA rounding of val itself; the clamp keeps penalty + bias finite
    bias = jnp.minimum(jnp.float32(2.0) * bound, jnp.float32(1e36))
    rowadd = rowadd + bias

    keys = _binmax_scan(
        qkern, codes, rowmul.reshape(1, n), rowadd.reshape(1, n),
        compute_dtype=compute_dtype, chunk=chunk, qblock=qblock,
    )
    kk = min(k, keys.shape[1])
    nb = keys.shape[1]
    nsl = chunk // _LANES
    sbits = nsl.bit_length() - 1
    if final == "auto":
        # serving default = the measured best point with recall >= .990
        # (r04 frontier, 2048-query recall, median-of-5 driver-style runs
        # at 1M x 768d: approx 154.3k QPS @ .9918 at depth 12 vs slot2
        # 124.0k @ .9962 vs exact 80.7k @ .9962). slot2 remains the
        # explicit quality option — its two-survivor selection is
        # measurably collision-free (recall == exact).
        final = "exact" if nb <= 8192 else "approx"
    # Select on the f32 VIEW of the keys in every mode: thanks to the
    # bias, valid keys are bit patterns of normal positive floats (order
    # preserved, all 32 bits, nothing flushable) and tombstones are ~-3e38
    # normals that sort last. The returned values bitcast straight back to
    # keys, so no gather of the key matrix.
    #
    # Cost/recall frontier over the [Q, ~31.5k] survivors, measured on
    # v5e at 1M x 768 (Q=2048, same seed, clean idle host) as end-to-end
    # bench.py runs (r03 round; r04 re-measured on 2048-query recall —
    # see BENCH_r04/FRONTIER artifacts):
    #   - "approx": single ApproxTopK k=40 (one survivor per slot, budget
    #     2048, then sort): 146.7k QPS @ .9859 — slot collisions drop
    #     true top-10 rows that int8 noise pushed to shortlist rank ~40
    #     (miss ~ rank/2048);
    #   - "approx2": partitioned halves, independent budgets: 124.7k @
    #     .9922 — collision odds ~4x lower, but the final per-part sorts
    #     double;
    #   - "slot2": two survivors per strided slot (_slot2_select): the
    #     default — collision loss needs TWO better slotmates
    #     (~(r*S/nb)^2/2 ~ 1e-3 at rank 40), the cascade is ~5 aligned
    #     VPU ops per survivor, and the exact sort runs over [Q, 2*nb/S]
    #     only;
    #   - "exact": lax.top_k over all survivors (XLA full sort): the
    #     recall ceiling at ~the cost of the whole scan again (82.5k @
    #     .9938).
    fview = lax.bitcast_convert_type(keys, jnp.float32)
    drop = sbits
    if (final in ("slot2", "slot2t", "slot2c", "slot2a")
            and kk < nb and _slot_plan(nb)):
        style = {"slot2": "mask", "slot2t": "tree", "slot2c": "chain",
                 "slot2a": "maska"}[final]
        sel, pos, drop = _slot2_select(keys, kk, sbits, style)
    elif final == "approx2" and kk < nb and nb >= 16384 and nb % 2 == 0:
        sub = nb // 2
        fv = fview.reshape(qp * 2, sub)
        fs, ps = lax.approx_max_k(fv, kk, recall_target=0.95)
        # row r of fv is (query r // 2, half r % 2): shift the in-half
        # positions back to global bin indices
        ps = ps + (
            (jnp.arange(qp * 2, dtype=jnp.int32) % 2) * sub
        )[:, None]
        fsel, i2 = lax.top_k(fs.reshape(qp, 2 * kk), kk)
        pos = jnp.take_along_axis(ps.reshape(qp, 2 * kk), i2, axis=1)
        sel = lax.bitcast_convert_type(fsel, jnp.int32)
    elif final == "approx" and kk < nb:
        fsel, pos = lax.approx_max_k(fview, kk, recall_target=0.95)
        sel = lax.bitcast_convert_type(fsel, jnp.int32)
    else:
        fsel, pos = lax.top_k(fview, kk)  # [qp, kk] over N/bin candidates
        sel = lax.bitcast_convert_type(fsel, jnp.int32)
    # unpack: low key bits carry the slice index; the column carries
    # (chunk index, lane) — the row id is reconstructed bit-wise
    ids = ((pos // _LANES) * chunk + (sel & (nsl - 1)) * _LANES
           + pos % _LANES)
    best = lax.bitcast_convert_type(
        sel & jnp.int32(-(1 << drop)), jnp.float32
    )

    # per-query affine back to the negated-distance convention (qmul > 0,
    # so ranking within each query is unchanged; merges stay compatible).
    # un-bias first: best ~ B + val, and the packing error (2^-18 * B) —
    # not this subtraction — dominates the residual.
    negd = (best - bias) * qmul + qadd
    negd = jnp.where(best > _INVALID_CUT, negd, -jnp.inf)
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


# ---------------------------------------------------------------------------
# unit-norm int8 cosine path: all-integer epilogue
# ---------------------------------------------------------------------------
#
# When rows are pre-normalized (cosine is norm-invariant) and quantized with
# ONE global scale, per-row factors vanish: ranking — within a query AND
# across shards — is by the raw s8xs8->s32 dot alone. The kernel epilogue
# then needs no FMA and no float conversion at all: pack the slice index
# into the low bits (dots <= 127*127*D fits 24 bits at D=768; <<5 leaves
# 29-bit values) and take an integer maximum. Tombstones cannot ride a
# rowadd here, so this path serves the immutable/suffix-padded layout
# (DistributedFlatIndex): fully-dead bins are masked by ``bin_live``;
# callers rerank the shortlist against a high-precision copy, which also
# evicts any stray tombstoned row.
#
# Measured (v5e, 1M x 768d, Q=2048 pipelined): 127.3k QPS @ recall .986 —
# SLOWER than the f32-FMA fused kernel above (145.8k @ .991): int32
# shift/or/max does not outrun f32 FMA/and/or/max on this VPU, and the
# storage savings (no scale/sqnorm) are the only win. Kept as the
# memory-minimal variant; defaults stay on the FMA kernel.

def _int_kernel(q_ref, c_ref, out_ref, *, chunk):
    nsl = chunk // _LANES
    sh = nsl.bit_length() - 1
    dots = lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [qblock, chunk]
    m = jnp.left_shift(dots[:, :_LANES], sh)
    for s in range(1, nsl):
        m = jnp.maximum(
            m, jnp.left_shift(dots[:, s * _LANES:(s + 1) * _LANES], sh) | s
        )
    out_ref[:] = m


@functools.partial(jax.jit, static_argnames=("chunk", "qblock"))
def _binmax_scan_i8(queries_i8, codes_i8, *, chunk, qblock):
    """Integer grid scan -> packed per-bin max: [qp, nbins] int32."""
    qp, d = queries_i8.shape
    n = codes_i8.shape[0]
    nchunks = n // chunk
    nbins = nchunks * _LANES
    grid_spec = pl.GridSpec(
        grid=(nchunks, qp // qblock),
        in_specs=[
            pl.BlockSpec((qblock, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qblock, _LANES), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    (vals,) = pl.pallas_call(
        functools.partial(_int_kernel, chunk=chunk),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
        out_shape=[jax.ShapeDtypeStruct((qp, nbins), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * d * n,
            bytes_accessed=n * d + qp * d + qp * nbins * 4,
            transcendentals=0,
        ),
    )(queries_i8, codes_i8)
    return vals


_DEAD = -(1 << 30)  # below any real packed value (see supports); plain int
                    # so importing this module never initializes the backend


def unit_i8_supports(n: int, dim: int, metric) -> bool:
    """Shape/metric rules for the integer path. dim <= 2048 bounds the
    packed value: |dot| <= 127*127*dim, <<5 must stay under 2^30 so the
    dead sentinel and the +2^30 bitcast offset cannot overflow int32."""
    return (
        Metric.parse(metric) == Metric.COSINE
        and dim % 128 == 0
        and dim <= 2048
        and n % _CHUNK == 0
    )


def unit_i8_bin_live(valid: np.ndarray, chunk: int) -> np.ndarray:
    """[nbins] bool: bins containing at least one valid row, in the
    kernel's bin order (chunk-major, lane-minor). ``valid`` is the local
    row mask of one shard; its length must divide by ``chunk``."""
    n = valid.shape[0]
    nsl = chunk // _LANES
    return (
        np.asarray(valid, bool)
        .reshape(n // chunk, nsl, _LANES)
        .any(axis=1)
        .reshape(-1)
    )


@functools.partial(jax.jit, static_argnames=("k", "final"))
def fused_unit_i8_neg_topk(queries, codes, gscale, bin_live, *, k,
                           final: str = "auto"):
    """Cosine shortlist over unit-norm global-scale int8 rows.

    Returns ``(negd [Q, k], ids [Q, k])`` where negd is the int8-precision
    negated cosine distance (comparable across shards because gscale is
    global and the per-query factor is per query). Callers should rerank
    (rerank_neg_topk) — it restores high-precision order and drops any
    tombstoned row that won its bin.
    """
    queries = jnp.asarray(queries, jnp.float32)
    q, d = queries.shape
    n = codes.shape[0]
    if not unit_i8_supports(n, d, Metric.COSINE):
        # dim > 2048 would overflow the <<5 packing + 2^30 offset into
        # silently wrong ids/scores — refuse at trace time (public entry
        # point; stores guard, direct callers might not)
        raise ValueError(
            f"fused_unit_i8_neg_topk unsupported for n={n}, dim={d}: "
            f"needs dim % 128 == 0, dim <= 2048, n % {_CHUNK} == 0"
        )
    chunk = chunk_for(n)
    nsl = chunk // _LANES
    sh = nsl.bit_length() - 1

    qp, qblock = _pick_qblock(q, 32)
    qf = jnp.pad(queries, [(0, qp - q), (0, 0)]) if qp != q else queries
    qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qscale = jnp.where(qmax > 0, qmax / 127.0, 1.0)
    qi = jnp.round(qf / qscale).clip(-127, 127).astype(jnp.int8)

    packed = _binmax_scan_i8(qi, codes, chunk=chunk, qblock=qblock)
    packed = jnp.where(bin_live.reshape(1, -1), packed, _DEAD)
    # monotone int shift into the non-negative range: +2^30 leaves the low
    # slice bits intact (2^30 has zero low bits), makes every real value
    # positive (min packed ~ -4e8 > -2^30), and turns _DEAD into exactly 0
    # — so both the f32-bitcast view (bit patterns of non-negative floats
    # order like their ints) and plain int comparisons rank correctly.
    shifted = packed + jnp.int32(1 << 30)
    kk = min(k, packed.shape[1])
    nb = packed.shape[1]
    if final == "auto":
        # slot2 at serving sizes: exact costs ~the scan itself at
        # [Q, ~31k] (the r03 frontier: 82.5k vs 146.7k QPS end-to-end);
        # slot2 keeps exact-grade recall at ApproxTopK-grade cost (see
        # _slot2_select / fused_scan_neg_topk's frontier table)
        final = "slot2" if (nb > 8192 and _slot_plan(nb)) else "exact"
    if final == "slot2" and kk < nb and _slot_plan(nb):
        ssel, pos, _ = _slot2_select(shifted, kk, sh)
        # member bits overwrote dot bits [0, mbits) — a <=2^6 perturbation
        # of a ~1e7-scale dot, far below int8 noise; slice bits are intact
        sel = ssel - jnp.int32(1 << 30)
    elif final == "approx" and kk < nb:
        fval = lax.bitcast_convert_type(shifted, jnp.float32)
        _, pos = lax.approx_max_k(fval, kk, recall_target=0.95)
        sel = jnp.take_along_axis(packed, pos, axis=1)
    else:
        fval = lax.bitcast_convert_type(shifted, jnp.float32)
        _, pos = lax.top_k(fval, kk)
        sel = jnp.take_along_axis(packed, pos, axis=1)
    ids = (pos // _LANES) * chunk + (sel & (nsl - 1)) * _LANES + pos % _LANES

    qn = jnp.maximum(jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True)), 1e-30)
    dots = (sel >> sh).astype(jnp.float32)
    negd = dots * (gscale * qscale / qn) - 1.0  # cos - 1 = -dist
    # dead bins sit at ~-2^30 (slot2 member bits can nudge _DEAD slightly,
    # so threshold rather than test equality); real values are > -2^29
    negd = jnp.where(sel < jnp.int32(-(1 << 29)), -jnp.inf, negd)
    return negd[:q], ids[:q].astype(jnp.int32)

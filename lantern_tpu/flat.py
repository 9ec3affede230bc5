"""Flat MXU scan — the TPU-native fast path for k-NN search.

The reference's entire value proposition is avoiding the O(n) scan on CPU
(README.md:145-157: HNSW beats seq scan by orders of magnitude). On TPU the
economics invert: a dense bf16 matmul against the whole table runs on the
MXU at ~200 TFLOP/s while graph traversal serializes on HBM random access.
Measured on v5e at 1M x 128d: one-shot scan ~200k QPS at recall@10 0.98
(approx top-k) vs ~3k QPS for the batched HNSW beam search and ~1k QPS for
the single-core CPU engine. This module is therefore the default search
strategy whenever the (possibly quantized) table fits HBM; the HNSW graph
remains the structure of record for CPU-side search, incremental
maintenance, and snapshot parity.

Scoring is rank-equivalent, not metric-equal: l2sq ranks by 2<q,x> - |x|^2,
cosine by <q,x>/|x|; true distances are reconstructed for the returned k
only. Top-k uses jax.lax.approx_max_k (the TPU PartialReduce lowering) with
a configurable recall_target, or exact jax.lax.top_k.

Hamming runs as a blocked XOR+popcount reduction over packed u32 words (no
MXU path for bit ops; still one fused VPU sweep per block).

Why no IVF/partition pruning: on the MXU, batched dense compute is cheaper
than the gathers pruning needs. A probed-partition search must gather
nprobe*partition_size rows PER QUERY (random HBM access, the expensive
operation on TPU), while the dense scan reads the table ONCE per query
batch and amortizes it across all Q queries — at Q>=1024 the per-query
table-read cost is negligible and the scan runs at the matmul roofline
(measured 1.46 ms/batch at 1M x 128d, within 10% of peak). Pruning only
pays when per-query FLOPs dominate AND the candidate gather stays under
the shared table read, which on this hardware does not happen at any
HBM-resident scale. Beyond-HBM scale is served by PQ codes (16-32x) +
rerank, sharding across chips, and the graph path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lantern_tpu.config import Metric
from lantern_tpu.ops.distance import _popcount_u32

# one-shot scans materialize/fuse a [Q, N] score block; beyond this N the
# scan is blocked to bound the intermediate (and its HBM round trip)
ONESHOT_MAX_N = 1 << 21


def _scores(vectors, sq_norms, queries_f32, metric: Metric, vec_scales=None,
            precision=None):
    """[Q, d] x [N, d] -> [Q, N] DESCENDING-better scores (rank-equivalent).

    ``precision``: forwarded to the scoring matmul. The TPU's DEFAULT
    matmul truncates f32 operands to bf16, which adds ~0.1 d2 noise —
    larger than per-rank distance gaps on clustered data (~0.03-0.1 at
    jitter 0.35), so a default-precision "exact" scan returns a top-k that
    disagrees with the true f32 ranking by ~2.6% (measured,
    benchmarks/exp_rerank_precision.py r4). flat_search(exact=True) — the
    ground-truth/comparator mode — passes Precision.HIGHEST.
    """
    qf = queries_f32.astype(vectors.dtype) if vectors.dtype != jnp.int8 else (
        queries_f32.astype(jnp.bfloat16)
    )
    op = vectors.astype(jnp.bfloat16) if vectors.dtype == jnp.int8 else vectors
    dots = jax.lax.dot_general(
        qf, op, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    if vec_scales is not None:  # i8 codes carry a per-vector scale
        dots = dots * vec_scales[None, :]
    if metric == Metric.L2SQ:
        return 2.0 * dots - sq_norms[None, :]
    # cosine: rank by dot / |x| (|q| constant per row)
    return dots / jnp.maximum(jnp.sqrt(sq_norms)[None, :], 1e-30)


def _hamming_scores(vectors_u32, queries_u32):
    """Packed-bit hamming: [Q, W] x [N, W] -> [Q, N] scores (= -distance)."""
    x = jnp.bitwise_xor(
        queries_u32[:, None, :].astype(jnp.uint32),
        vectors_u32[None, :, :].astype(jnp.uint32),
    )
    return -jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)


def _score_to_dist(score, q_sq, metric: Metric):
    if metric == Metric.L2SQ:
        return q_sq[:, None] - score
    if metric == Metric.COS:
        return 1.0 - score / jnp.maximum(jnp.sqrt(q_sq)[:, None], 1e-30)
    return -score  # hamming scores are negated distances


def _blocked_flat_topk(score_fn, arrays, q, n, k, k_out, block, q_sq,
                       metric, exact, recall_target):
    """Shared blocked-scan top-k merge (flat_search / flat_search_pq).

    ``score_fn(**slices)`` maps row-slices of ``arrays`` (dict name ->
    [N, ...] array or None; None entries are passed through as None) to a
    [Q, B] DESCENDING-better score block, applying any tombstone mask
    itself. One-shot below ``block`` rows; otherwise a lax.scan over full
    blocks with a multi-operand sort merge, plus one partial tail step.
    Returns (dists [Q, k_out] ascending, ids [Q, k_out]).
    """
    names = list(arrays)

    def block_topk(score, kk=k):
        if exact:
            return jax.lax.top_k(score, kk)
        return jax.lax.approx_max_k(score, kk, recall_target=recall_target)

    if n <= block:
        bd, bi = block_topk(score_fn(**arrays))
        # order descending by score -> ascending distance. multi-operand
        # sort, NOT argsort+take_along_axis — positional gathers on [Q, k]
        # arrays lower to serialized element gathers (CLAUDE.md)
        sd, si = jax.lax.sort((-bd, bi), dimension=1, num_keys=1,
                              is_stable=False)
        bd, bi = -sd, si
    else:
        nb = n // block
        tail = n - nb * block  # remainder handled in a final partial step
        xs = {
            name: a[: nb * block].reshape((nb, block) + a.shape[1:])
            for name, a in arrays.items() if a is not None
        }
        xs["off"] = jnp.arange(nb, dtype=jnp.int32)[:, None] * block

        def body(carry, xs_b):
            best_d, best_i = carry
            s = score_fn(**{name: xs_b.get(name) for name in names})
            bd, bi = block_topk(s)
            bi = bi + xs_b["off"]
            md, mi = jax.lax.sort(
                (jnp.concatenate([best_d, bd], 1),
                 jnp.concatenate([best_i, bi], 1)),
                dimension=1, num_keys=1, is_stable=False,
            )
            return (md[:, -k:], mi[:, -k:]), None

        init = (jnp.full((q, k), -jnp.inf), jnp.full((q, k), -1, jnp.int32))
        (bd, bi), _ = jax.lax.scan(body, init, xs)
        if tail:
            s = score_fn(**{
                name: (a[nb * block:] if a is not None else None)
                for name, a in arrays.items()
            })
            kt = min(k, tail)
            # exact top_k is a slow TPU custom call (profiled 34 ms at
            # tail=82k, B=1024) — use the approx reduction unless exact
            # results were requested
            if exact or kt >= tail:
                td, ti = jax.lax.top_k(s, kt)
            else:
                td, ti = jax.lax.approx_max_k(s, kt,
                                              recall_target=recall_target)
            pad = k - ti.shape[1]
            if pad:
                td = jnp.concatenate([td, jnp.full((q, pad), -jnp.inf)], 1)
                ti = jnp.concatenate([ti, jnp.full((q, pad), -1, jnp.int32)], 1)
            md, mi = jax.lax.sort(
                (jnp.concatenate([bd, td], 1),
                 jnp.concatenate([bi, ti + nb * block], 1)),
                dimension=1, num_keys=1, is_stable=False,
            )
            bd, bi = md[:, -k:], mi[:, -k:]
        # ascending order for the final result
        bd, bi = bd[:, ::-1], bi[:, ::-1]
    out_d = _score_to_dist(bd, q_sq, metric)
    return _pad_k(
        jnp.where(jnp.isfinite(bd), out_d, jnp.inf),
        jnp.where(jnp.isfinite(bd), bi, -1),
        k_out,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "exact", "recall_target", "block"),
)
def flat_search(
    vectors: jax.Array,      # [N, d] f32/bf16/i8 (or [N, W] u32 for hamming)
    sq_norms: jax.Array,     # [N] f32 (ignored for hamming)
    queries: jax.Array,      # [Q, d] f32 (or [Q, W] u32)
    k: int = 10,
    metric: int = int(Metric.L2SQ),
    exact: bool = False,
    recall_target: float = 0.95,
    block: int | None = None,
    vec_scales: jax.Array | None = None,
    deleted: jax.Array | None = None,
):
    """Dense scan top-k. Returns (dists [Q,k] ascending, ids [Q,k]).

    ``deleted``: optional [N] bool tombstone mask (delete.c semantics —
    tombstoned rows are excluded from results).
    """
    metric = Metric(metric)
    n = vectors.shape[0]
    q = queries.shape[0]
    k_out = k
    k = min(k, n)  # fewer rows than k: compute what exists, pad at the end
    if metric == Metric.HAMMING:
        q_sq = jnp.zeros((q,), jnp.float32)
    else:
        qf = queries.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)

    # exact=True is the ground-truth/comparator mode: score at HIGHEST
    # precision so f32 tables rank by TRUE f32 distances (the default TPU
    # matmul bf16-truncates f32 operands; see _scores). bf16/i8 tables are
    # quantized at rest — HIGHEST there only burns passes on already-lossy
    # operands, so keep the default.
    prec = (jax.lax.Precision.HIGHEST
            if exact and vectors.dtype == jnp.float32 else None)

    def score_fn(v, nrm=None, sc=None, dele=None):
        if metric == Metric.HAMMING:
            s = _hamming_scores(v, queries)
        else:
            s = _scores(v, nrm, queries, metric, sc, precision=prec)
        if dele is not None:
            s = jnp.where(dele[None, :], -jnp.inf, s)
        return s

    if block is None:
        if metric == Metric.HAMMING:
            # XOR+popcount materializes [Q, B, W]; keep B small
            block = min(n, 8192)
        else:
            block = n if n <= ONESHOT_MAX_N else ONESHOT_MAX_N

    return _blocked_flat_topk(
        score_fn,
        {"v": vectors, "nrm": sq_norms, "sc": vec_scales, "dele": deleted},
        q, n, k, k_out, block, q_sq, metric, exact, recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "exact", "recall_target", "block"),
)
def flat_search_pq(
    codes: jax.Array,        # [N, S] uint8 PQ codes
    centroids: jax.Array,    # [S, K, dsub] f32 codebook
    queries: jax.Array,      # [Q, dim] f32
    k: int = 10,
    metric: int = int(Metric.L2SQ),
    exact: bool = False,
    recall_target: float = 0.95,
    block: int = 1 << 19,
    deleted: jax.Array | None = None,
    rotation: jax.Array | None = None,
):
    """Flat ADC scan over PQ codes — decode-on-MXU, then dense scoring.

    The graph's ADC path (quant/pq.adc_distances) gathers per-candidate LUT
    entries; for a FULL-table scan the decoded block is reused across every
    query in the batch, so it's cheaper to reconstruct each block once and
    score it with one dense matmul:

        decoded[b]  = concat_s centroids[s, codes[b, s]]      (bf16, MXU)
        score[q, b] = 2<q, decoded[b]> - ||decoded[b]||^2     (l2sq ranks)

    Decode runs as a Pallas kernel (ops/pallas_kernels.pq_decode_mxu): the
    flat one-hot lives only in VMEM and the contraction is one MXU-shaped
    [TB, S*K] @ [S*K, dim] dot. ||decoded||^2 comes from the decoded block
    itself (subspaces are disjoint dims, so |x|^2 = sum_s |x_s|^2 exactly).
    Decode FLOPs are per-BLOCK, independent of the query count — large
    query batches amortize them toward the plain-bf16 scan rate.

    Distances equal asymmetric PQ distances (exact query vs reconstructed
    vector) to bf16 precision. HBM traffic is the CODE bytes (N*S), 16x
    less than an f32 table at S=dim/4.
    Reference bar: the PQ search path (pqtable.c, scan.c:75-81 codebook
    load), reconstructed distance semantics of usearch's pq metric.
    """
    from lantern_tpu.ops.pallas_kernels import (
        _hilo_group,
        codebook_blockdiag,
        codebook_hilo,
        pq_decode_mxu,
        pq_decode_mxu_hilo,
    )

    metric = Metric(metric)
    if metric == Metric.HAMMING:
        raise ValueError("PQ scan supports l2sq/cos only")
    n, s = codes.shape
    q = queries.shape[0]
    k_out = k
    k = min(k, n)
    qf = queries.astype(jnp.float32)
    if rotation is not None:  # OPQ: codes live in the rotated space
        qf = jnp.dot(qf, rotation, preferred_element_type=jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1)
    # 8-bit codes (K=256, the standard configuration) take the hi/lo
    # kernel: bit-identical decode at ~5x less device time. The codebook
    # operand is hoisted here so the scan body reuses it per block.
    # _hilo_group returns 0 when the grouped codebook cannot fit VMEM at
    # any group size (dim >= ~16k) — those configs keep the subspace-tiled
    # pq_decode_mxu path, whose grid tiles the codebook (ADVICE r3).
    hilo = centroids.shape[1] == 256 and _hilo_group(
        s, centroids.shape[2]) >= 1
    cb_op = codebook_hilo(centroids) if hilo else codebook_blockdiag(centroids)
    qf_bf = qf.astype(jnp.bfloat16)
    interp = jax.default_backend() == "cpu"

    def score_fn(c, dele=None):
        if hilo:
            dec = pq_decode_mxu_hilo(c, cb_op, interpret=interp)
        else:
            dec = pq_decode_mxu(c, cb_op, interpret=interp)  # [B, dim] bf16
        x_sq = jnp.sum(
            dec.astype(jnp.float32) * dec.astype(jnp.float32), axis=1
        )
        dots = jax.lax.dot_general(
            qf_bf, dec, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == Metric.L2SQ:
            score = 2.0 * dots - x_sq[None, :]
        else:
            score = dots / jnp.maximum(jnp.sqrt(x_sq)[None, :], 1e-30)
        if dele is not None:
            score = jnp.where(dele[None, :], -jnp.inf, score)
        return score

    return _blocked_flat_topk(
        score_fn, {"c": codes, "dele": deleted},
        q, n, k, k_out, min(block, n), q_sq, metric, exact, recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "shortlist", "metric", "recall_target", "block"),
)
def flat_search_pq_rerank(
    codes: jax.Array,        # [N, S] uint8 PQ codes
    centroids: jax.Array,    # [S, K, dsub] f32 codebook
    vectors: jax.Array,      # [N, d] full-precision rows (rerank source)
    sq_norms: jax.Array,     # [N] f32
    queries: jax.Array,      # [Q, d] f32
    k: int = 10,
    shortlist: int = 100,
    metric: int = int(Metric.L2SQ),
    recall_target: float = 0.95,
    block: int = 1 << 19,
    deleted: jax.Array | None = None,
    rotation: jax.Array | None = None,
):
    """Two-stage PQ search: ADC scan shortlist -> exact rerank on full rows.

    The standard production recipe for quantized indexes: the coarse PQ scan
    retrieves ``shortlist`` candidates per query at code-bytes HBM cost, and
    the true metric re-scores only Q x shortlist gathered rows. recall@k
    becomes the PQ scan's recall@shortlist (e.g. 0.28 -> 0.9+ at 960d).
    The rerank source can be the same HBM table (bf16), or in HBM-overflow
    deployments the raw rows fetched by the host — the reference keeps raw
    vectors in the heap table alongside its PQ index (pqvec/pq columns), so
    full-precision rows always exist.

    Recall knobs, measured r4 (benchmarks/exp_rerank_sweep.py, 1M x 128d):
    raising ``recall_target`` to 0.99 makes the approx top-SHORTLIST
    reduction ~4x slower (18.2 -> 76.3 ms/batch) — buy coverage with a
    DEEPER shortlist at the default 0.95 target instead (the approx
    reduction's misses concentrate at the shortlist boundary, so depth
    recovers them at ~linear rerank cost, e.g. the benchmark rerank500/600
    legs). Sorting the shortlist ids ascending before the row gather
    measured NEUTRAL (18.17 vs 18.23 ms — the batched [Q, L] row gather is
    not address-order-bound at this shape); don't re-litigate without
    profiling.

    ``sq_norms`` is accepted for API stability but no longer read: |x|^2 is
    recomputed from the gathered rows (see inline note).
    """
    metric_e = Metric(metric)
    # ``block`` is forwarded to the ADC scan: some one-shot (n <= block)
    # approx-top-k program shapes deterministically hang this
    # environment's XLA TPU compile at large dim (see benchmarks/pq_960.py
    # BLK note) — callers force the blocked-merge path by passing a block
    # smaller than n.
    _, ids = flat_search_pq(
        codes, centroids, queries, k=shortlist, metric=metric,
        recall_target=recall_target, block=block, deleted=deleted,
        rotation=rotation,
    )
    safe = jnp.clip(ids, 0, vectors.shape[0] - 1)
    rows = vectors[safe].astype(jnp.float32)      # [Q, L, d]
    qf = queries.astype(jnp.float32)
    # HIGHEST precision: the TPU's DEFAULT matmul truncates f32 operands to
    # bf16, adding ~0.1 d2 noise — comparable to the per-rank gaps on
    # clustered data (~0.03-0.1 at jitter 0.35), which capped reranked
    # recall at 0.974 even with perfect shortlist coverage
    # (benchmarks/exp_rerank_precision.py, r4). The two rerank einsums (dots
    # + x_sq below) total ~0.16 GFLOP at Q=1024/L=300/d=128 (~0.08 each),
    # so the 6-pass f32 emulation costs nothing next to the ADC scan.
    dots = jnp.einsum("qd,qld->ql", qf, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    # |x|^2 recomputed from the gathered rows, NOT gathered from sq_norms:
    # the [Q, L] SCALAR gather costs ~100x more per byte than the row gather
    # it would piggyback on (CLAUDE.md) — measured 27.9k -> 29.6k QPS on the
    # 1M rerank@300. Also keeps |x|^2 consistent with the (possibly bf16)
    # rerank rows the dots were computed from.
    x_sq = jnp.einsum("qld,qld->ql", rows, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if metric_e == Metric.L2SQ:
        # clamp: bf16 rerank rows can round a self-match fractionally negative
        d = jnp.maximum(
            jnp.sum(qf * qf, axis=1)[:, None] - 2.0 * dots + x_sq, 0.0
        )
    else:
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=1))[:, None]
        d = 1.0 - dots / jnp.maximum(qn * jnp.sqrt(x_sq), 1e-30)
    d = jnp.where(ids >= 0, d, jnp.inf)
    # multi-operand sort carries ids with the keys — top_k +
    # take_along_axis on [Q, ~100] lowers to serialized element gathers
    # (~170 us; CLAUDE.md measurement facts)
    kk = min(k, d.shape[1])
    s_d, s_i = jax.lax.sort((d, ids), dimension=1, num_keys=1, is_stable=False)
    out_d = s_d[:, :kk]
    out_i = s_i[:, :kk]
    return _pad_k(
        jnp.where(jnp.isfinite(out_d), out_d, jnp.inf),
        jnp.where(jnp.isfinite(out_d), out_i, -1),
        k,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "shortlist", "recall_target")
)
def flat_search_graph_rerank(
    graph,
    rerank_rows: jax.Array,  # [n, d] bf16/f32 full-precision rows (HBM copy)
    rerank_sqn: jax.Array,   # [n] f32
    queries: jax.Array,      # [Q, d] f32
    k: int = 10,
    shortlist: int = 100,
    recall_target: float = 0.95,
    exclude: jax.Array | None = None,
):
    """Two-stage PQ search over a DeviceGraph, rerank ON DEVICE, one dispatch.

    ADC shortlist over the graph's codes, then exact re-score against a
    device-resident row table (bf16 halves the HBM cost of the copy; the
    returned distances are true metric distances to bf16 precision). The
    whole pipeline — ADC scan, shortlist row gather, rescoring einsum,
    final sort — is one jitted program, so a query batch pays one tunnel
    dispatch instead of a host round-trip between the stages.
    Returns (dists [Q,k], ids [Q,k], labels [Q,k,2]) like flat_search_graph.
    """
    from lantern_tpu.graph.device import QUANT_PQ

    if graph.quant != QUANT_PQ:
        raise ValueError("flat_search_graph_rerank serves PQ graphs only")
    excluded = jnp.logical_or(
        graph.deleted,
        jnp.arange(graph.cap, dtype=jnp.int32) >= graph.num_nodes,
    )
    if exclude is not None:
        excluded = jnp.logical_or(excluded, exclude)
    d, ids = flat_search_pq_rerank(
        graph.vectors[: graph.cap],
        graph.pq_codebook,
        rerank_rows,
        rerank_sqn,
        queries,
        k=k,
        shortlist=shortlist,
        metric=graph.metric,
        recall_target=recall_target,
        deleted=excluded,
        rotation=graph.pq_rotation,
    )
    labels = jnp.where(
        (ids >= 0)[:, :, None],
        graph.labels[jnp.clip(ids, 0, graph.cap - 1)],
        jnp.uint32(0),
    )
    return d, ids, labels


def _pad_k(d, ids, k_out: int):
    """Pad result columns out to k_out (dist +inf, id -1)."""
    q, k = d.shape
    if k == k_out:
        return d, ids
    return (
        jnp.concatenate([d, jnp.full((q, k_out - k), jnp.inf)], axis=1),
        jnp.concatenate([ids, jnp.full((q, k_out - k), -1, jnp.int32)], axis=1),
    )


def flat_search_graph(graph, queries, k: int = 10, exact: bool = False,
                      recall_target: float = 0.95, exclude=None):
    """Flat scan over a DeviceGraph's stored vectors (labels resolved).

    Returns (dists [Q,k], ids [Q,k], labels [Q,k,2]) like search_batched, so
    the Index facade can dispatch between graph traversal and flat scan.
    PQ-coded graphs run the flat ADC scan (decode-on-MXU).

    ``exclude``: optional [cap] bool mask — predicate-filtered search. The
    dense scan filters EXACTLY (masked rows score -inf before top-k), at
    zero extra cost: the filter is one fused select on the score block.
    """
    from lantern_tpu.graph.device import QUANT_PQ

    # exclude tombstones AND unfilled capacity rows (cap > num_nodes after
    # doubling growth: those rows are zeros and would score artificially well)
    excluded = jnp.logical_or(
        graph.deleted,
        jnp.arange(graph.cap, dtype=jnp.int32) >= graph.num_nodes,
    )
    if exclude is not None:
        excluded = jnp.logical_or(excluded, exclude)
    if graph.quant == QUANT_PQ:
        d, ids = flat_search_pq(
            graph.vectors[: graph.cap],
            graph.pq_codebook,
            queries,
            k=k,
            metric=graph.metric,
            exact=exact,
            recall_target=recall_target,
            deleted=excluded,
            rotation=graph.pq_rotation,
        )
        labels = jnp.where(
            (ids >= 0)[:, :, None],
            graph.labels[jnp.clip(ids, 0, graph.cap - 1)],
            jnp.uint32(0),
        )
        return d, ids, labels
    d, ids = flat_search(
        graph.vectors[: graph.cap],
        graph.sq_norms[: graph.cap],
        queries,
        k=k,
        metric=graph.metric,
        exact=exact,
        recall_target=recall_target,
        vec_scales=graph.vec_scales,
        deleted=excluded,
    )
    labels = jnp.where(
        (ids >= 0)[:, :, None],
        graph.labels[jnp.clip(ids, 0, graph.cap - 1)],
        jnp.uint32(0),
    )
    return d, ids, labels

"""Batched HNSW search on device — frontier expansion over padded CSR arrays.

The reference's per-query scan (usearch_search_ef: greedy top-layer descent +
ef-bounded best-first at level 0, every node visit a page pin through
ldb_wal_index_node_retriever — scan.c:167-338, external_index.c:613-671)
becomes a *batched* search over a block of Q queries:

- upper-level descent: all queries step in lockstep (one lax.while_loop per
  level nest), gathering the compact upper adjacency;
- level 0: a beam of ef candidates per query; each iteration expands the
  ``expand`` best unexpanded beam entries, gathers their neighbor lists,
  masks visited nodes, computes all candidate distances as one fused
  gather+contraction, and merges via jax.lax.top_k;
- termination: the classic HNSW criterion (best unexpanded > worst of a full
  beam) vectorized as a per-query active mask inside lax.while_loop.
- entry selection: one dense MXU scan over the ~n/m upper-level nodes
  (graph.upper_ids) — the exact best upper entry, no serialized descent.

Deleted nodes participate in traversal but are filtered from results,
matching the tombstone semantics of scan.c:296-300 / delete.c.

Everything is statically shaped: beam width ef, candidate block expand*2M,
re-visit filtering via the beam itself plus a [Q, expand*max_iters] log of
expanded ids (pure-VPU membership compares; no O(Q x cap) visited buffer).
No data-dependent shapes anywhere, so XLA compiles one fused program per
(ef, k, expand) configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lantern_tpu.config import Metric, SearchParams
from lantern_tpu.graph.device import DeviceGraph
from lantern_tpu.ops.distance import _popcount_u32

from lantern_tpu.graph.host_build import LMAX  # noqa: E402 — shared constant

_INF = jnp.inf

# Perf note (settled in r2): ascending-address "sorted gather" rewrites of
# the in-loop adjacency/vector/visited accesses were tried and DELETED —
# isolated microbenchmarks showed 15x on a 1M random gather, but in-loop
# A/B measurement had them neutral-to-slower (2.9k -> 2.0k QPS at 1M as
# they were enabled): XLA schedules in-loop gathers differently than
# isolated ones. Large-table throughput goes through the flat MXU scan
# (flat.py) instead; the graph path exists for PQ/ADC storage and
# HBM-overflow scales.


def _candidate_dists(graph: DeviceGraph, queries, q_sq, cand_ids, lut=None):
    """Distances from each query to its candidate ids.

    queries [Q, w], cand_ids [Q, C] (pre-clipped to valid range) -> [Q, C] f32.
    ``lut`` is the precomputed ADC table [Q, S, K] when the graph stores PQ
    codes (graph.quant == QUANT_PQ).
    """
    from lantern_tpu.graph.device import QUANT_PQ

    metric = Metric(graph.metric)
    if (
        graph.use_pallas
        and graph.vec_scales is None
        and graph.quant != QUANT_PQ
        and metric != Metric.HAMMING
    ):
        # fused DMA gather + distance (no [Q, C, d] HBM intermediate)
        from lantern_tpu.ops.pallas_gather import gather_dists_pallas

        return gather_dists_pallas(
            graph.vectors,
            cand_ids,
            queries,
            q_sq,
            metric=int(metric),
            qb=16,
            interpret=jax.default_backend() == "cpu",
        )
    if (
        graph.vectors_aug is not None
        and metric == Metric.L2SQ
        and graph.vec_scales is None
        and graph.quant != QUANT_PQ
    ):
        # norm-folded row gather (device.aug_norms_table): ONE row gather
        # carries x AND x2; the einsum against [q, -0.5, -0.5, 0, 0] yields
        # q.x - x2/2, so the [Q, C] sq_norms SCALAR gather (profiled 467
        # us/iter at 1M ef64 — 30% of the batch, fusion.88 in the r5 trace)
        # disappears. Row gathers are latency-bound, so the 4 extra columns
        # are free (gather_rate_result.json).
        from lantern_tpu.graph.device import aug_queries

        rows = graph.vectors_aug[cand_ids]  # [Q, C, d+AUG_COLS]
        dots = jnp.einsum(
            "qe,qce->qc",
            aug_queries(queries),
            rows.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return q_sq[:, None] - 2.0 * dots
    if graph.quant == QUANT_PQ:
        from lantern_tpu.quant.pq import adc_distances

        vecs = graph.vectors[cand_ids]  # [Q, C, S] code gather
        part = adc_distances(lut, vecs.astype(jnp.int32))
        if metric == Metric.L2SQ:
            return part  # LUT already encodes ||q_s - c_sk||^2
        # cosine: part = sum of dots; combine with decoded-vector norms
        qn = jnp.sqrt(q_sq)[:, None]
        xn = jnp.sqrt(graph.sq_norms[cand_ids])
        return 1.0 - part / jnp.maximum(qn * xn, 1e-30)

    vecs = graph.vectors[cand_ids]  # [Q, C, w]
    if metric == Metric.HAMMING:
        x = jnp.bitwise_xor(
            queries[:, None, :].astype(jnp.uint32), vecs.astype(jnp.uint32)
        )
        return jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)
    # NOTE: the sq_norms scalar gather below is ~1 ms/iter (serialized
    # element loads); recomputing x_sq from the gathered rows was tried and
    # REVERTED — the second reduction over the [Q, C, d] block broke XLA's
    # gather+dot fusion and cost 8x overall (7.6k -> 0.9k QPS at 100k).
    dots = jnp.einsum(
        "qd,qcd->qc",
        queries.astype(jnp.float32),
        vecs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if graph.vec_scales is not None:
        dots = dots * graph.vec_scales[cand_ids]
    if metric == Metric.L2SQ:
        return q_sq[:, None] - 2.0 * dots + graph.sq_norms[cand_ids]
    qn = jnp.sqrt(q_sq)[:, None]
    xn = jnp.sqrt(graph.sq_norms[cand_ids])
    return 1.0 - dots / jnp.maximum(qn * xn, 1e-30)


def _upper_descent(graph: DeviceGraph, queries, q_sq, lut=None):
    """Greedy 1-beam descent from the entry point down to level 1.

    Returns the per-query entry node for the level-0 beam search.
    """
    q = queries.shape[0]
    m = graph.upper_neighbors.shape[2]
    ucap = graph.upper_neighbors.shape[0]
    flat_upper = graph.upper_neighbors.reshape(ucap * LMAX, m)

    curr = jnp.full((q,), graph.entry, jnp.int32)
    curr_d = _candidate_dists(graph, queries, q_sq, curr[:, None], lut)[:, 0]

    def level_cond(state):
        lvl, _, _ = state
        return lvl >= 1

    def level_body(state):
        lvl, curr, curr_d = state

        def greedy_cond(s):
            _, _, improving, steps = s
            return jnp.logical_and(jnp.any(improving), steps < 64)

        def greedy_body(s):
            curr, curr_d, improving, steps = s
            slot = jnp.clip(graph.upper_slot[curr], 0, ucap - 1)
            rows = slot * LMAX + (lvl - 1)
            nbrs = flat_upper[rows]  # [Q, m]
            valid = nbrs >= 0
            ids = jnp.where(valid, nbrs, 0)
            d = _candidate_dists(graph, queries, q_sq, ids, lut)
            d = jnp.where(valid, d, _INF)
            j = jnp.argmin(d, axis=1)
            best_d = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
            best_id = jnp.take_along_axis(nbrs, j[:, None], axis=1)[:, 0]
            better = jnp.logical_and(improving, best_d < curr_d)
            curr = jnp.where(better, best_id, curr)
            curr_d = jnp.where(better, best_d, curr_d)
            return curr, curr_d, better, steps + 1

        curr, curr_d, _, _ = jax.lax.while_loop(
            greedy_cond,
            greedy_body,
            (curr, curr_d, jnp.ones((q,), bool), jnp.int32(0)),
        )
        return lvl - 1, curr, curr_d

    _, curr, curr_d = jax.lax.while_loop(
        level_cond, level_body, (graph.max_level, curr, curr_d)
    )
    return curr, curr_d


def _upper_entry_scan(graph: DeviceGraph, queries, q_sq, seeds: int = 1):
    """Entry selection by ONE dense scan over the upper-level node set.

    The reference walks upper layers greedily per query (scan.c via
    usearch_search_ef's descent). Batched lockstep greedy descent serializes
    ~100 while-loop steps (profiled 101 ms of a 260 ms batch at 1M, mostly
    loop overhead); the upper node set is only ~n/m nodes, so scoring ALL of
    them with one MXU scan is faster AND yields the (near-)exact best upper
    entry — approx top-k at recall_target 0.999; greedy descent only finds a
    local minimum of the level-1 graph, so entries here are typically
    better, and the level-0 beam absorbs the rare 0.1% miss.

    ``seeds`` > 1 returns the top-``seeds`` upper nodes — the beam starts
    from several good, well-separated entries at once (the dense scan makes
    multi-seeding free; a serial greedy descent cannot afford it). Missing
    seeds (fewer scorable upper nodes than ``seeds``) get id -1 / dist inf;
    seed 0 falls back to graph.entry so at least one live candidate exists.

    Requires graph.upper_ids (slot -> node id). Returns (entry_ids
    [Q, seeds], entry_d [Q, seeds]).
    """
    from lantern_tpu.flat import flat_search, flat_search_pq
    from lantern_tpu.graph.device import QUANT_PQ

    uids = graph.upper_ids
    safe = jnp.maximum(uids, 0)
    # blank slots, and (mid-growth graphs) planned-but-not-yet-inserted nodes
    excluded = jnp.logical_or(uids < 0, safe >= graph.num_nodes)
    # single-seed keeps the near-exact entry (rt 0.999); multi-seed drops to
    # rt 0.95 — approx_max_k's 0.999 reduction costs ~4x (CLAUDE.md), and
    # with many seeds a 95%-quality seed set loses nothing the beam doesn't
    # recover (r5 trace: the k=16 rt-0.999 scan was 11.8 ms of a 49.5 ms
    # batch; rt 0.95 collapses it to ~1.5 ms at unchanged search recall)
    seed_rt = 0.999 if seeds == 1 else 0.95
    if graph.quant == QUANT_PQ:
        d, loc = flat_search_pq(
            graph.vectors[safe], graph.pq_codebook, queries,
            k=seeds, metric=graph.metric, deleted=excluded,
            recall_target=seed_rt,
        )
    else:
        # with_aug_norms caches the upper-subset tables — the [ucap, d]
        # dense gather otherwise reruns every batch (~1.1 ms at 1M)
        cached = (
            graph.upper_vectors is not None
            and graph.upper_sq is not None
            and graph.vec_scales is None
        )
        d, loc = flat_search(
            graph.upper_vectors if cached else graph.vectors[safe],
            graph.upper_sq if cached else graph.sq_norms[safe],
            queries,
            k=seeds,
            metric=graph.metric,
            vec_scales=(
                graph.vec_scales[safe] if graph.vec_scales is not None else None
            ),
            deleted=excluded,
            recall_target=seed_rt,
        )
    found = loc >= 0  # [Q, seeds]
    entry_ids = jnp.where(
        found, safe[jnp.clip(loc, 0, safe.shape[0] - 1)], -1
    )
    # rare fallback (no scorable upper node): true distance to graph.entry
    # so the entry itself stays a valid result candidate — seed 0 only,
    # further seeds stay invalid
    q = queries.shape[0]
    lut0 = None
    if graph.quant == QUANT_PQ:
        from lantern_tpu.quant.pq import adc_lut

        lut0 = adc_lut(queries, graph.pq_codebook, Metric(graph.metric))
    dflt = _candidate_dists(
        graph, queries, q_sq,
        jnp.broadcast_to(graph.entry, (q,))[:, None], lut0,
    )[:, 0]
    entry_ids = entry_ids.at[:, 0].set(
        jnp.where(found[:, 0], entry_ids[:, 0], graph.entry)
    )
    entry_d = jnp.where(found, d, _INF)
    entry_d = entry_d.at[:, 0].set(jnp.where(found[:, 0], d[:, 0], dflt))
    return entry_ids, entry_d


def _dedup_fresh(ids, fresh):
    """Within-row dedup: keep only the first occurrence of each id.

    Sort-with-payload + a tiny one-hot contraction; positional scatters and
    take_along_axis lower to serialized element ops on TPU (see the op-choice
    note in search_batched.body).
    """
    q, c = ids.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, c), 1)
    key = jnp.where(fresh, ids, -1 - iota)  # invalids get unique negatives
    skey, spos = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((q, 1), bool), skey[:, 1:] == skey[:, :-1]], axis=1
    )
    # dup[q, spos[q, j]] = dup_sorted[q, j], via one-hot OR over sorted slots
    oh = spos[:, :, None] == iota[:, None, :]  # [q, c_sorted, c_orig]
    dup = jnp.any(jnp.logical_and(oh, dup_sorted[:, :, None]), axis=1)
    return jnp.logical_and(fresh, jnp.logical_not(dup))


@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "expand", "max_iters", "with_stats", "seeds"),
)
def search_batched(
    graph: DeviceGraph,
    queries: jax.Array,
    k: int = 10,
    ef: int = 64,
    expand: int = 1,
    max_iters: int | None = None,
    with_stats: bool = False,
    exclude: jax.Array | None = None,
    seeds: int = 1,
):
    """Batched k-NN search. queries [Q, width] -> (dists, ids, labels) [Q, k].

    Invalid result slots (fewer than k reachable live nodes) have id -1,
    dist +inf, label 0.

    ``seeds``: number of upper-scan entry points placed in the initial beam
    (requires graph.upper_ids; the greedy-descent fallback always uses 1).
    The dense upper scan prices top-``seeds`` the same as top-1, and
    starting from several separated entries reaches the query's basin in
    fewer beam iterations.

    ``with_stats=True`` appends a stats dict — per-query visited/expanded
    node counts and the loop iteration count — the debugging surface the
    reference exposes via lantern.masked_explain + ldb_dlog cost dumps
    (lantern.sql:858-901, hnsw.c:202-208).

    ``exclude``: optional [cap] bool mask of nodes to drop from the RESULTS
    (predicate-filtered search). Excluded nodes still route traversal —
    the same emit-time treatment as tombstones, which is how the reference
    behaves when the executor filters rows above the index scan. Under
    heavy filtering raise ef (or use the flat path, which filters exactly).
    """
    ef = max(ef, k)
    if max_iters is None:
        max_iters = 2 * ef // expand + 16
    q = queries.shape[0]
    cap = graph.cap
    m0 = graph.m0
    c = expand * m0

    metric = Metric(graph.metric)
    from lantern_tpu.graph.device import QUANT_PQ
    if graph.quant == QUANT_PQ and graph.pq_rotation is not None:
        # OPQ: codes/centroids live in the rotated space — rotate the query
        # ONCE here; every downstream distance (LUT, upper entry scan) then
        # operates in that space. Distances are preserved (R is orthogonal).
        queries = jnp.dot(
            queries.astype(jnp.float32), graph.pq_rotation,
            preferred_element_type=jnp.float32,
        )
    if metric == Metric.HAMMING:
        q_sq = jnp.zeros((q,), jnp.float32)
    else:
        qf = queries.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=1)

    lut = None
    if graph.quant == QUANT_PQ:
        from lantern_tpu.quant.pq import adc_lut
        lut = adc_lut(queries, graph.pq_codebook, metric)

    if graph.upper_ids is not None and graph.upper_ids.shape[0] > 1:
        seeds = max(1, min(seeds, ef))
        entry_ids, entry_d = _upper_entry_scan(graph, queries, q_sq, seeds)
    else:
        entry_ids, entry_d = _upper_descent(graph, queries, q_sq, lut)
        entry_ids, entry_d = entry_ids[:, None], entry_d[:, None]
        seeds = 1

    # ---- level-0 beam state ----
    beam_d = jnp.concatenate(
        [entry_d, jnp.full((q, ef - seeds), _INF)], axis=1
    )
    beam_ids = jnp.concatenate(
        [entry_ids, jnp.full((q, ef - seeds), -1, jnp.int32)], axis=1
    )
    expanded = jnp.zeros((q, ef), bool)
    # Re-visit filter: candidates already IN the beam, or in the log of
    # every id ever expanded, are skipped. The former visited BITMASK
    # ([Q, (cap+1)/32] u32) needed a take_along_axis word gather + scatter
    # per iteration — serialized element ops, 62 ms of a 260 ms batch at
    # 1M — and O(Q*cap) memory (1.3 GB/batch at 10M). The log holds at most
    # expand*max_iters ids, so membership is a pure-VPU broadcast compare.
    # Semantics vs the bitmask: a node that entered the beam, was displaced,
    # and is rediscovered later gets re-SCORED (never re-expanded) — wasted
    # distance rows only; results are identical because re-merging an id
    # worse than the current beam floor cannot change the beam.
    log_w = expand * max_iters
    exp_log = jnp.full((q, log_w), -2, jnp.int32)  # -2: matches no id
    # every scored seed counts as visited
    visited_n = jnp.sum(jnp.isfinite(entry_d), axis=1).astype(jnp.int32)

    def active_mask(beam_d, beam_ids, expanded):
        valid = beam_ids >= 0
        unexp = jnp.logical_and(valid, jnp.logical_not(expanded))
        best_unexp = jnp.min(jnp.where(unexp, beam_d, _INF), axis=1)
        worst = beam_d[:, -1]  # inf while beam not full
        return jnp.logical_and(jnp.any(unexp, axis=1), best_unexp <= worst)

    def cond(state):
        beam_d, beam_ids, expanded, exp_log, visited_n, it = state
        return jnp.logical_and(
            it < max_iters, jnp.any(active_mask(beam_d, beam_ids, expanded))
        )

    def body(state):
        beam_d, beam_ids, expanded, exp_log, visited_n, it = state
        act = active_mask(beam_d, beam_ids, expanded)

        # pick `expand` best unexpanded entries per active query.
        # NOTE on op choice here and below: take_along_axis / positional
        # scatter on TPU lower to serialized per-element gathers (~170us for
        # a [256, 96] payload — profiled); multi-operand lax.sort (~6us) and
        # small one-hot contractions replace them throughout this loop.
        unexp_d = jnp.where(
            jnp.logical_and(beam_ids >= 0, jnp.logical_not(expanded)), beam_d, _INF
        )
        unexp_d = jnp.where(act[:, None], unexp_d, _INF)
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (q, ef), 1)
        sorted_d, sel_ids, sel_slots = jax.lax.sort(
            (unexp_d, beam_ids, slot_iota), dimension=1, num_keys=1
        )
        sel_valid = jnp.isfinite(sorted_d[:, :expand])
        exp_ids = jnp.where(sel_valid, sel_ids[:, :expand], cap)
        # mark selected beam slots expanded via a one-hot OR (no scatter)
        sel_oh = jnp.logical_and(
            sel_slots[:, :expand, None] == slot_iota[:, None, :],
            sel_valid[:, :, None],
        )
        expanded = jnp.logical_or(expanded, jnp.any(sel_oh, axis=1))
        # append the expanded ids to the log (contiguous small write)
        exp_log = jax.lax.dynamic_update_slice(
            exp_log,
            jnp.where(sel_valid, sel_ids[:, :expand], -2),
            (jnp.int32(0), it * expand),
        )

        # gather neighbor lists -> candidate block [Q, C]
        nbrs = graph.neighbors0[exp_ids].reshape(q, c)
        valid = nbrs >= 0
        nbrs_c = jnp.where(valid, nbrs, cap)
        in_beam = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=2)
        in_log = jnp.any(nbrs[:, :, None] == exp_log[:, None, :], axis=2)
        fresh = jnp.logical_and(
            valid, jnp.logical_not(jnp.logical_or(in_beam, in_log))
        )
        # dedup unconditionally: expanded nodes can share neighbors
        # (expand>1) and imported graphs may carry duplicate adjacency
        # entries — a duplicate candidate would enter the beam twice
        fresh = _dedup_fresh(nbrs, fresh)
        visited_n = visited_n + jnp.sum(fresh, axis=1).astype(jnp.int32)

        d = _candidate_dists(graph, queries, q_sq, jnp.where(fresh, nbrs_c, 0), lut)
        d = jnp.where(fresh, d, _INF)

        # merge candidates into beam: ONE multi-operand sort carries the
        # payloads (ids, expanded) with the keys — no positional gathers
        cat_d = jnp.concatenate([beam_d, d], axis=1)
        cat_ids = jnp.concatenate([beam_ids, jnp.where(fresh, nbrs, -1)], axis=1)
        cat_exp = jnp.concatenate(
            [expanded.astype(jnp.int32), jnp.zeros((q, c), jnp.int32)], axis=1
        )
        s_d, s_ids, s_exp = jax.lax.sort(
            (cat_d, cat_ids, cat_exp), dimension=1, num_keys=1
        )
        beam_d = s_d[:, :ef]
        beam_ids = s_ids[:, :ef]
        expanded = s_exp[:, :ef].astype(bool)
        return beam_d, beam_ids, expanded, exp_log, visited_n, it + 1

    beam_d, beam_ids, expanded, exp_log, visited_n, iters_done = jax.lax.while_loop(
        cond, body, (beam_d, beam_ids, expanded, exp_log, visited_n, jnp.int32(0))
    )

    # filter tombstones + invalid (+ predicate exclusions), take final top-k
    # (delete.c semantics)
    dead = graph.deleted[jnp.clip(beam_ids, 0, cap - 1)]
    if exclude is not None:
        dead = jnp.logical_or(dead, exclude[jnp.clip(beam_ids, 0, cap - 1)])
    final_d = jnp.where(
        jnp.logical_or(beam_ids < 0, dead), _INF, beam_d
    )
    neg_top, arg = jax.lax.top_k(-final_d, k)
    out_d = -neg_top
    out_ids = jnp.where(
        jnp.isfinite(out_d), jnp.take_along_axis(beam_ids, arg, axis=1), -1
    )
    out_labels = jnp.where(
        (out_ids >= 0)[:, :, None],
        graph.labels[jnp.clip(out_ids, 0, cap - 1)],
        jnp.uint32(0),
    )  # [Q, k, 2] u32 pairs; join with device.join_labels on host
    if with_stats:
        stats = {
            "iterations": iters_done,
            # distance computations; re-scored beam-dropped nodes are rare
            # double counts — clip so the unique-visited invariant
            # (visited <= n) the validator asserts still holds
            "visited": jnp.minimum(visited_n, graph.num_nodes),
            # every expansion is appended to exp_log, so counting it (not
            # the final beam's expanded flags, which lose nodes displaced
            # from the beam) gives the true per-query expansion cost
            "expanded": jnp.sum(exp_log != -2, axis=1).astype(jnp.int32),
        }
        return out_d, out_ids, out_labels, stats
    return out_d, out_ids, out_labels


def search(graph: DeviceGraph, queries, params: SearchParams | None = None, **kw):
    """Convenience wrapper taking SearchParams (GUC-analog knobs)."""
    params = params or SearchParams()
    ef = params.ef if params.ef is not None else max(64, params.k)
    return search_batched(
        graph,
        queries,
        k=params.k,
        ef=ef,
        expand=params.expand,
        max_iters=params.max_iters,
        seeds=params.seeds,
        **kw,
    )

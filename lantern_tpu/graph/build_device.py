"""Batched HNSW construction on device — the TPU-native index builder.

Replaces the reference's construction paths — the single-threaded in-process
build (build.c BuildCallback → usearch_add per tuple) and the multicore
external indexing server (server.rs:311-375, N threads × add_raw with
per-node locks) — with data-parallel insert ROUNDS:

round(batch B of new nodes):
  1. candidate search: one batched ef_construction search of the current
     graph (the same frontier-expansion kernel queries use);
  2. within-batch candidates: exact pairwise distances among the batch, so
     batch members can link to each other (what sequential insertion gets
     for free);
  3. neighbor selection: the classic HNSW diversity heuristic ("keep c iff
     closer to the query than to any kept neighbor"), vectorized as a scan
     over the sorted candidate pool with a [B, C, C] pairwise-distance mask;
  4. forward edges: one scatter into the new nodes' adjacency rows;
  5. reverse edges: edges grouped by target via sort + segment ranks (at
     most ``max_in`` incomers kept per target per round), then a vectorized
     append-or-prune pass over target lanes (prune = the same heuristic,
     matching add_link overflow semantics in the sequential engines).

Levels are pre-drawn host-side with the same floor(-ln(U)/ln(M)) law
(insert.c:32-46); upper-level adjacency selects from candidates filtered by
level (batch construction's analog of per-level search).

Everything is statically shaped and jitted once; graph arrays are donated so
each round updates HBM in place. Masked lanes (round padding, absent levels)
scatter to dedicated dummy rows — row ``cap`` of neighbors0 and upper slot
``ucap-1`` — so no real row ever sees a conflicting masked write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import flax.struct as struct

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.graph.device import DeviceGraph
from lantern_tpu.graph.host_build import LMAX
from lantern_tpu.graph.search import search_batched

_INF = jnp.inf


@struct.dataclass
class BuildState:
    vectors: jax.Array          # [cap, dim] (all vectors preloaded)
    sq_norms: jax.Array         # [cap]
    neighbors0: jax.Array       # [cap+1, m0] (row cap = dummy)
    upper_neighbors: jax.Array  # [ucap, LMAX, m] (slot ucap-1 = dummy)
    upper_slot: jax.Array       # [cap]
    levels: jax.Array           # [cap]
    entry: jax.Array            # []
    max_level: jax.Array        # []
    n: jax.Array                # [] nodes inserted so far
    m: int = struct.field(pytree_node=False, default=16)
    dim: int = struct.field(pytree_node=False, default=0)
    metric: int = struct.field(pytree_node=False, default=int(Metric.L2SQ))
    # slot -> PLANNED node id (levels are drawn up front, so the inverse
    # map is static for the whole build). Lets beam-candidate rounds use
    # the dense upper-entry scan + multi-seeding instead of the serialized
    # greedy descent (~100 ms/round at 1M, r2 profile); search masks ids
    # >= st.n itself (not-yet-inserted nodes are excluded mid-growth).
    upper_ids: jax.Array | None = None  # [ucap] int32


def _graph_view(st: BuildState) -> DeviceGraph:
    cap = st.vectors.shape[0]
    return DeviceGraph(
        vectors=st.vectors,
        sq_norms=st.sq_norms,
        neighbors0=st.neighbors0,
        upper_neighbors=st.upper_neighbors,
        upper_slot=st.upper_slot,
        levels=st.levels,
        labels=jnp.zeros((cap, 2), jnp.uint32),
        deleted=jnp.zeros((cap,), bool),
        entry=st.entry,
        max_level=st.max_level,
        num_nodes=st.n,
        upper_ids=st.upper_ids,
        m=st.m,
        dim=st.dim,
        metric=st.metric,
    )


def _gather_view(vectors):
    """bf16 copy of the vector table for the build's candidate gathers.

    The insert round is gather-bound, not FLOP-bound (profiled at 1M/v5e:
    the [L, c2, d] candidate row gathers are the top op at 15-18 ms of a
    ~70 ms round, upper-pool gathers another ~12 ms). Row gathers are
    mostly row-LATENCY-bound, so halving row bytes trims the top gather
    ~16% (18.3 -> 15.3 ms) — the bigger wins are feeding the MXU's native
    bf16 path and halving the matmul operand bytes. Distances during
    construction shift by ~0.4% relative (bf16 rounding); neighbor
    selection is rank-based and 1M recall is unchanged at ef 64/128
    (measured). Kept f32 on CPU (bf16 there is emulated — the
    virtual-mesh test suite would slow ~10x) and for u32 hamming words /
    i8 codes (cast is useless resp. byte-doubling)."""
    if vectors.dtype == jnp.float32 and jax.default_backend() == "tpu":
        return vectors.astype(jnp.bfloat16)
    return vectors


def _sq_of(vecs, metric: Metric):
    """Squared norms recomputed from gathered rows. Scalar gathers of a
    precomputed sq_norms array lower to serialized element loads on TPU
    (profiled: [4096, 24] f32 gather = 9.3 ms vs 1.8 ms for the [4096*40,
    128] ROW gather feeding it) — summing squares of the already-gathered
    vectors is fused VPU work, ~free."""
    if metric == Metric.HAMMING:
        return jnp.zeros(vecs.shape[:-1], jnp.float32)
    v = vecs.astype(jnp.float32)
    return jnp.sum(v * v, axis=-1)


def _pair_dists(vecs_a, sq_a, vecs_b, sq_b, metric: Metric):
    """[B, C, d] x [B, E, d] -> [B, C, E] distances (l2sq/cos/hamming).

    For hamming, inputs are packed u32 words and the sq args are ignored
    (XOR + popcount; no MXU path for bit ops)."""
    if metric == Metric.HAMMING:
        from lantern_tpu.ops.distance import _popcount_u32

        x = jnp.bitwise_xor(
            vecs_a[:, :, None, :].astype(jnp.uint32),
            vecs_b[:, None, :, :].astype(jnp.uint32),
        )
        return jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)
    # bf16 inputs hit the MXU's native bf16xbf16->f32 path; upcasting them
    # first would force the (2x slower) f32 MXU path
    a = vecs_a if vecs_a.dtype == jnp.bfloat16 else vecs_a.astype(jnp.float32)
    b = vecs_b if vecs_b.dtype == jnp.bfloat16 else vecs_b.astype(jnp.float32)
    dots = jnp.einsum("bcd,bed->bce", a, b, preferred_element_type=jnp.float32)
    if metric == Metric.L2SQ:
        return sq_a[:, :, None] - 2.0 * dots + sq_b[:, None, :]
    na = jnp.sqrt(sq_a)[:, :, None]
    nb = jnp.sqrt(sq_b)[:, None, :]
    return 1.0 - dots / jnp.maximum(na * nb, 1e-30)


def select_heuristic_batch(pool_d, pair_d, keep_mask, m):
    """Vectorized HNSW selection heuristic.

    pool_d  [B, C]   candidate→query distances, ASCENDING order per row
    pair_d  [B, C, C] candidate↔candidate distances
    keep_mask [B, C] which candidates are eligible at all
    Returns selected mask [B, C] with at most m True per row.
    """
    b, c = pool_d.shape

    def step(carry, j):
        selected, count = carry
        # violation: some already-selected s has pair_d[:, j, s] <= pool_d[:, j]
        viol = jnp.any(
            jnp.logical_and(selected, pair_d[:, j, :] <= pool_d[:, j, None]),
            axis=1,
        )
        keep = jnp.logical_and(
            jnp.logical_and(keep_mask[:, j], count < m), jnp.logical_not(viol)
        )
        selected = selected.at[:, j].set(keep)
        return (selected, count + keep.astype(jnp.int32)), None

    (selected, _), _ = jax.lax.scan(
        step, (jnp.zeros((b, c), bool), jnp.zeros((b,), jnp.int32)), jnp.arange(c)
    )
    return selected


def _mask_to_ids(pool_ids, selected, m):
    """Compact a selection mask to m id slots (-1 padded), preserving order.

    One multi-operand lax.sort: argsort + 2x take_along_axis lowered to
    serialized element gathers (profiled 44 ms/round at 1M).
    """
    b, c = pool_ids.shape
    key = jnp.where(selected, jax.lax.broadcasted_iota(jnp.int32, (b, c), 1), c + 1)
    _, picked, valid_i = jax.lax.sort(
        (key, pool_ids, selected.astype(jnp.int32)),
        dimension=1, num_keys=1, is_stable=False,
    )
    return jnp.where(valid_i[:, :m] > 0, picked[:, :m], -1)


def _scatter_reverse(
    adjacency,          # [R, deg] adjacency, row dummy_row is scratch
    row_of_target,      # fn: target id array -> row index array
    dummy_row: int,
    targets,            # [E] target node ids (-1 = skip)
    sources,            # [E] new node ids
    all_vectors,        # gather view ([cap, d], bf16 on TPU — _gather_view)
    metric: Metric,
    maxdeg: int,
    max_in: int,
    lane_chunk: int = 1024,
    lane_budget: int | None = None,
):
    """Append sources into their targets' adjacency rows, pruning overflow
    with the selection heuristic. Conflicts: edges sorted by target; the
    first lane of each target segment performs the combined update; at most
    ``max_in`` incomers per target per round are kept (closest-first order
    is not guaranteed — matches the arbitrary arrival order of concurrent
    inserts in the reference's threaded server).

    ``lane_budget``: statically cap the number of lane slots processed after
    compacting valid (first-occurrence) lanes to the front. Upper-level
    rounds have at most ~B/m contributing nodes, so nearly every one of
    their B*m lanes is masked — without the cap the lane pass costs as much
    as level 0's (profiled 46 ms/level/round at B=1024). Callers pass a
    many-sigma statistical bound; in the astronomically unlikely overflow,
    excess targets merely miss this round's reverse edges (graph quality,
    never correctness)."""
    e = targets.shape[0]
    r = adjacency.shape[0]
    order = jnp.argsort(jnp.where(targets >= 0, targets, jnp.int32(2**30)))
    t_sorted = targets[order]
    s_sorted = sources[order]
    valid = t_sorted >= 0
    first = jnp.concatenate([jnp.ones((1,), bool), t_sorted[1:] != t_sorted[:-1]])
    first = jnp.logical_and(first, valid)
    pos = jnp.arange(e)
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    rank = pos - seg_start

    # incoming table [R, max_in]; masked writes go to dummy_row
    t_rows = jnp.where(valid, row_of_target(jnp.maximum(t_sorted, 0)), dummy_row)
    write_row = jnp.where(jnp.logical_and(valid, rank < max_in), t_rows, dummy_row)
    inc = jnp.full((r, max_in), -1, jnp.int32)
    inc = inc.at[write_row, jnp.minimum(rank, max_in - 1)].set(
        jnp.where(rank < max_in, s_sorted, -1)
    )

    # lane pass: one lane per first-occurrence target, chunked
    lane_all = jnp.where(first, t_sorted, -1)
    if lane_budget is not None and lane_budget < e:
        # compact valid lanes to the front (stable), then slice the budget
        order2 = jnp.argsort((lane_all < 0).astype(jnp.int32), stable=True)
        lane_all = lane_all[order2][:lane_budget]
    pad = (-lane_all.shape[0]) % lane_chunk
    lane_t = jnp.concatenate(
        [lane_all, jnp.full((pad,), -1, jnp.int32)]
    )
    nchunks = lane_t.shape[0] // lane_chunk
    c2 = maxdeg + max_in

    def chunk_body(adj, ci):
        lt = jax.lax.dynamic_slice_in_dim(lane_t, ci * lane_chunk, lane_chunk)
        active = lt >= 0
        lrow = jnp.where(active, row_of_target(jnp.maximum(lt, 0)), dummy_row)
        old = adj[lrow]                       # [L, maxdeg]
        incoming = inc[lrow]                  # [L, max_in]
        cand = jnp.concatenate([old, incoming], axis=1)  # [L, c2]
        cvalid = jnp.logical_and(cand >= 0, active[:, None])
        # dedup: within-batch mutual selection can put an incomer that is
        # already a forward neighbor (t chose s AND s chose t in one round);
        # keep only the first occurrence of each id
        eq = cand[:, :, None] == cand[:, None, :]          # [L, c2, c2]
        lower = jnp.tril(jnp.ones((cand.shape[1], cand.shape[1]), bool), k=-1)
        dup = jnp.any(
            eq & lower[None, :, :] & cvalid[:, None, :], axis=2
        )
        cvalid = jnp.logical_and(cvalid, jnp.logical_not(dup))
        cand_c = jnp.where(cvalid, cand, 0)
        t_safe = jnp.where(active, lt, 0)
        tvec = all_vectors[t_safe]
        tsq = _sq_of(tvec, metric)
        cvecs = all_vectors[cand_c]           # [L, c2, d]
        csq = _sq_of(cvecs, metric)
        d_t = _pair_dists(tvec[:, None, :], tsq[:, None], cvecs, csq, metric)[:, 0, :]
        d_t = jnp.where(cvalid, d_t, _INF)
        count = jnp.sum(cvalid, axis=1)
        overflow = count > maxdeg
        # sort candidates by distance to target. One multi-operand sort for
        # the scalar payloads; the pairwise matrix is computed UNSORTED and
        # permuted on the MXU with the one-hot permutation (argsort +
        # take_along_axis lowered to serialized element gathers; the [L,c2,d]
        # vector reshuffle alone profiled 28 ms/round at 1M).
        iota = jax.lax.broadcasted_iota(jnp.int32, d_t.shape, 1)
        d_s, cand_s, valid_i, perm = jax.lax.sort(
            (d_t, cand, cvalid.astype(jnp.int32), iota),
            dimension=1, num_keys=1, is_stable=True,
        )
        valid_s = valid_i > 0
        pair_u = _pair_dists(cvecs, csq, cvecs, csq, metric)
        p_mat = jax.nn.one_hot(perm, d_t.shape[1], dtype=jnp.float32)
        # pair[i, j] = pair_u[perm[i], perm[j]]
        pair = jnp.einsum(
            "lij,ljk->lik", p_mat,
            jnp.einsum("ljk,lmk->ljm", pair_u, p_mat,
                       preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32,
        )
        sel_mask = select_heuristic_batch(d_s, pair, valid_s, maxdeg)
        pruned = _mask_to_ids(cand_s, sel_mask, maxdeg)
        appended = _mask_to_ids(cand_s, valid_s, maxdeg)
        new_row = jnp.where(overflow[:, None], pruned, appended)
        write = jnp.where(active, lrow, dummy_row)
        adj = adj.at[write].set(jnp.where(active[:, None], new_row, adj[dummy_row]))
        return adj, None

    adjacency, _ = jax.lax.scan(chunk_body, adjacency, jnp.arange(nchunks))
    return adjacency


def _insert_round(st: BuildState, ids: jax.Array, level_ids: tuple, efc: int,
                  max_in: int, flat_cand: bool = False,
                  gv: jax.Array | None = None,
                  level_vecs: tuple | None = None):
    """Insert a batch of node ids (-1 = padding lane) into the graph.

    ``level_ids``: per-level static id lists (level_ids[l-1] = all node ids
    with level >= l, -1 padded). Upper-level neighbors are selected from
    EXACT nearest nodes of that level — the upper layers are geometrically
    small (N/m^l nodes), so exact beats the reference's search-derived
    upper candidates at negligible matmul cost.

    ``flat_cand``: generate the level-0 candidate pool with a masked FLAT
    MXU scan of the already-built prefix instead of beam traversal. Profiled
    on v5e at 100k: the beam search is 91% of the round (484 of 531 ms),
    bound by serialized in-loop gathers; the flat scan replaces it with one
    dense matmul + approx top-k. Candidates become (approximately) the TRUE
    efc nearest built nodes — a strictly better pool than beam search's —
    so this changes the constructed graph (for the better; recall parity is
    asserted in tests either way).

    ``gv``/``level_vecs``: the bf16 gather view and the hoisted per-level
    (vectors, sq) gathers — supplied by insert_rounds so they live OUTSIDE
    the scan carry (loop-invariant; recomputed here when called standalone).
    """
    metric = Metric(st.metric)
    b = ids.shape[0]
    m = st.m
    m0 = 2 * m
    cap = st.vectors.shape[0]
    ucap = st.upper_neighbors.shape[0]
    active = ids >= 0
    safe_ids = jnp.where(active, ids, 0)
    if gv is None:
        gv = _gather_view(st.vectors)
    qvecs = gv[safe_ids]
    qsq = _sq_of(qvecs, metric)

    if flat_cand:
        # 1) exact(ish) candidates: one masked dense scan of rows [0, n)
        from lantern_tpu.flat import flat_search

        not_built = jnp.arange(cap, dtype=jnp.int32) >= st.n
        # hamming must keep flat_search's small default block (None ->
        # min(n, 8192)): its XOR+popcount materializes a [B, block, W]
        # intermediate, ~2 GB at block=1<<17, batch=1024, 128-bit vectors
        block = (
            None if (cap <= (1 << 17) or metric == Metric.HAMMING)
            else (1 << 17)
        )
        d_cand, cand = flat_search(
            gv, st.sq_norms, qvecs.astype(st.vectors.dtype), k=efc,
            metric=int(metric),
            exact=False, recall_target=0.95, block=block, deleted=not_built,
        )
    else:
        # 1) candidate search of current graph (expand=4: fewer, wider
        # frontier iterations — same pool quality, ~4x fewer serial steps).
        # With the planned upper_ids map the search takes the dense entry
        # scan + 16 seeds (r5: greedy descent alone was ~100 ms/round).
        d_cand, cand, _ = search_batched(
            _graph_view(st), qvecs.astype(st.vectors.dtype), k=efc, ef=efc,
            expand=4, seeds=16 if st.upper_ids is not None else 1,
        )

    # 2) within-batch candidates (exact); mask self and padding lanes
    wb_d_full = _pair_dists(
        qvecs[None], qsq[None], qvecs[None], qsq[None], metric
    )[0]  # [B, B]
    bad = jnp.logical_or(jnp.eye(b, dtype=bool), jnp.logical_not(active)[None, :])
    wb_d_full = jnp.where(bad, _INF, wb_d_full)
    wb_k = min(b, m0)
    neg_wb, wb_j = jax.lax.top_k(-wb_d_full, wb_k)
    wb_d = -neg_wb
    wb_ids = jnp.where(jnp.isfinite(wb_d), safe_ids[wb_j], -1)

    # 3) merged pool, sorted ascending, deduped
    pool_ids = jnp.concatenate([cand, wb_ids], axis=1)
    pool_d = jnp.concatenate(
        [jnp.where(cand >= 0, d_cand, _INF), jnp.where(wb_ids >= 0, wb_d, _INF)],
        axis=1,
    )
    # one multi-operand sort, ids as tiebreak key so duplicate ids are
    # guaranteed adjacent for the dedup below (argsort + take_along_axis
    # lowers to serialized element gathers — ~5 ms/round at 1M)
    pool_d, pool_ids = jax.lax.sort(
        (pool_d, pool_ids), dimension=1, num_keys=2, is_stable=False
    )
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), pool_ids[:, 1:] == pool_ids[:, :-1]], axis=1
    )
    pool_valid = (pool_ids >= 0) & ~dup & active[:, None]
    # a node can find itself when it is the pre-seeded entry point
    pool_valid &= pool_ids != safe_ids[:, None]
    pool_d = jnp.where(pool_valid, pool_d, _INF)

    pool_c = jnp.where(pool_valid, pool_ids, 0)
    pvecs = gv[pool_c]  # [B, C, d]
    psq = _sq_of(pvecs, metric)
    pair = _pair_dists(pvecs, psq, pvecs, psq, metric)  # [B, C, C]

    new_levels = jnp.where(active, st.levels[safe_ids], -1)

    # ---- level 0: select, forward scatter, reverse update ----
    sel0 = select_heuristic_batch(pool_d, pair, pool_valid, m)
    fwd0 = _mask_to_ids(pool_ids, sel0, m)  # [B, m]
    row0 = jnp.concatenate([fwd0, jnp.full((b, m0 - m), -1, jnp.int32)], axis=1)
    write0 = jnp.where(active, safe_ids, cap)  # row cap = dummy
    neighbors0 = st.neighbors0.at[write0].set(
        jnp.where(active[:, None], row0, st.neighbors0[cap])
    )
    neighbors0 = _scatter_reverse(
        neighbors0,
        lambda t: t,
        cap,
        jnp.where(active[:, None], fwd0, -1).reshape(-1),
        jnp.repeat(safe_ids, m),
        gv,
        metric,
        m0,
        max_in,
        # one chunk up to 16k lanes: the per-chunk selection heuristic is a
        # sequential scan over c2 columns, so fewer chunks = fewer serial
        # steps (4 chunks of 4096 cost ~2x one chunk of 16384 — profiled)
        lane_chunk=16384,
    )

    # ---- upper levels: exact per-level candidate pools ----
    flat = st.upper_neighbors.reshape(ucap * LMAX, m)
    dummy_flat = (ucap - 1) * LMAX  # any row of the dummy slot
    n0 = st.n  # nodes inserted before this round
    for lvl in range(1, len(level_ids) + 1):
        node_has = new_levels >= lvl
        lids = level_ids[lvl - 1]  # [Ll] -1 padded
        if level_vecs is not None:
            lvecs, lsq = level_vecs[lvl - 1]
        else:
            lvecs = gv[jnp.maximum(lids, 0)]
            lsq = _sq_of(lvecs, metric)
        d_up = _pair_dists(qvecs[None], qsq[None], lvecs[None], lsq[None], metric)[0]
        usable = (lids >= 0) & (lids < n0)  # inserted, not self (self not < n0)
        d_up = jnp.where(usable[None, :], d_up, _INF)
        kk = min(2 * m, lids.shape[0])
        # approx_max_k = the TPU PartialReduce lowering (exact fallback on
        # CPU); exact top_k over the [B, 32k] level-1 pool was 6.9 ms/round
        # and upper layers are navigation aids — 0.95 recall is plenty
        neg_u, uj = jax.lax.approx_max_k(-d_up, kk, recall_target=0.95)
        up_d = -neg_u
        up_ids = jnp.where(jnp.isfinite(up_d), lids[uj], -1)
        # merge with within-batch members of this level
        wb_lvl_ok = st.levels[jnp.maximum(wb_ids, 0)] >= lvl
        wb_ids_l = jnp.where((wb_ids >= 0) & wb_lvl_ok, wb_ids, -1)
        pu_ids = jnp.concatenate([up_ids, wb_ids_l], axis=1)
        pu_d = jnp.concatenate(
            [jnp.where(up_ids >= 0, up_d, _INF), jnp.where(wb_ids_l >= 0, wb_d, _INF)],
            axis=1,
        )
        pu_d, pu_ids = jax.lax.sort(
            (pu_d, pu_ids), dimension=1, num_keys=2, is_stable=False
        )
        udup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), pu_ids[:, 1:] == pu_ids[:, :-1]], axis=1
        )
        pu_ok = (pu_ids >= 0) & ~udup & node_has[:, None]
        pu_ok &= pu_ids != safe_ids[:, None]
        pu_d = jnp.where(pu_ok, pu_d, _INF)
        pu_c = jnp.where(pu_ok, pu_ids, 0)
        puv = gv[pu_c]
        pusq = _sq_of(puv, metric)
        upair = _pair_dists(puv, pusq, puv, pusq, metric)
        sel = select_heuristic_batch(pu_d, upair, pu_ok, m)
        fwd = _mask_to_ids(pu_ids, sel, m)  # [B, m]
        slots = jnp.where(node_has, st.upper_slot[safe_ids], ucap - 1)
        write_rows = jnp.where(node_has, slots * LMAX + (lvl - 1), dummy_flat)
        flat = flat.at[write_rows].set(
            jnp.where(node_has[:, None], fwd, flat[dummy_flat])
        )
        flat = _scatter_reverse(
            flat,
            lambda t: jnp.clip(st.upper_slot[t], 0, ucap - 1) * LMAX + (lvl - 1),
            dummy_flat,
            jnp.where(node_has[:, None], fwd, -1).reshape(-1),
            jnp.repeat(safe_ids, m),
            gv,
            metric,
            m,
            max_in,
            lane_chunk=4096,
            # level >= 1 holds ~B/m of the batch (P(level>=l) = m^-l), so
            # valid lanes ~ B edges; 4B is a >20-sigma bound
            lane_budget=min(b * m, 4 * b),
        )
    upper = flat.reshape(ucap, LMAX, m)

    # ---- entry point / max level / count ----
    batch_max = jnp.max(new_levels)
    batch_arg = safe_ids[jnp.argmax(new_levels)]
    better = batch_max > st.max_level
    entry = jnp.where(better, batch_arg, st.entry)
    max_level = jnp.where(better, batch_max, st.max_level)

    return st.replace(
        neighbors0=neighbors0,
        upper_neighbors=upper,
        entry=entry,
        max_level=max_level,
        n=st.n + jnp.sum(active.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit, static_argnames=("efc", "max_in", "flat_cand"), donate_argnums=(0,)
)
def insert_rounds(st: BuildState, ids2d: jax.Array, level_ids: tuple,
                  efc: int, max_in: int,
                  flat_cand: bool = False) -> BuildState:
    """R insert rounds as ONE dispatch: lax.scan over stacked ids [R, size].

    With flat candidates the per-round device time is small, so per-call
    dispatch latency (remote-execute tunnel) would otherwise dominate;
    grouping consecutive equal-size rounds into one scanned program bounds
    the dispatch count (compile count: one per (size, group-length) pair).
    On local hardware the grouping is neutral.

    The carry holds ONLY the arrays a round mutates; everything
    loop-invariant (vectors, the bf16 gather view, per-level vector
    gathers, sq_norms, levels, slots) enters as a closure constant so it
    is computed/gathered once per dispatch, not once per round (the
    upper-pool gathers alone profiled ~12 ms/round at 1M).
    """
    gv = _gather_view(st.vectors)
    metric = Metric(st.metric)
    level_vecs = tuple(
        (lambda v: (v, _sq_of(v, metric)))(gv[jnp.maximum(lids, 0)])
        for lids in level_ids
    )

    def body(mut, ids):
        neighbors0, upper, entry, max_level, nn = mut
        full = st.replace(
            neighbors0=neighbors0, upper_neighbors=upper,
            entry=entry, max_level=max_level, n=nn,
        )
        out = _insert_round(full, ids, level_ids, efc, max_in, flat_cand,
                            gv=gv, level_vecs=level_vecs)
        return (out.neighbors0, out.upper_neighbors, out.entry,
                out.max_level, out.n), None

    mut0 = (st.neighbors0, st.upper_neighbors, st.entry, st.max_level, st.n)
    (neighbors0, upper, entry, max_level, nn), _ = jax.lax.scan(
        body, mut0, ids2d
    )
    return st.replace(
        neighbors0=neighbors0, upper_neighbors=upper,
        entry=entry, max_level=max_level, n=nn,
    )


def ramped_batches(n: int, batch: int, min_batch: int = 32):
    """Round schedule (start, size): rounds ramp 4x from ``min_batch`` so a
    round never exceeds ~1/4 of the already-built graph (small graphs get
    small rounds — batch staleness is what costs recall early — while large
    graphs run at full ``batch``). Only log4(batch) distinct sizes compile.
    """
    pos = 0
    while pos < n:
        b = min_batch
        while b * 4 <= batch and b * 4 <= max(pos, min_batch) // 4:
            b *= 4
        if batch <= max(pos, min_batch) // 4:
            b = batch  # graph is big enough for the full round size
        b = min(b, batch)
        yield pos, min(b, n - pos), b  # (start, live count, padded round size)
        pos += min(b, n - pos)


ROUND_GROUP = 16  # max rounds fused into one insert_rounds dispatch


def _grouped_round_ids(n: int, batch: int):
    """Yield (ids2d [R, size], done_count): consecutive equal-size rounds of
    the ramped schedule stacked into groups of <= ROUND_GROUP."""
    pending: list[np.ndarray] = []
    pend_size = -1
    done = 0

    def flush():
        return np.stack(pending), done

    for start, live, size in ramped_batches(n, batch):
        ids = np.full(size, -1, np.int32)
        ids[:live] = np.arange(start, start + live, dtype=np.int32)
        if pending and (size != pend_size or len(pending) == ROUND_GROUP):
            yield flush()
            pending = []
        pending.append(ids)
        pend_size = size
        done = start + live
    if pending:
        yield flush()


def device_insert(
    graph: DeviceGraph,
    vectors,
    labels: np.ndarray | None = None,
    batch: int = 256,
    seed: int = 0,
    max_in: int | None = None,
    ef_construction: int = 128,
    candidates: str = "flat",
    flat_until: int | None = None,
) -> DeviceGraph:
    """Incrementally insert vectors into an existing DeviceGraph.

    The device analog of ldb_aminsert (insert.c): the same batched insert
    rounds run against the live graph; arrays grow by doubling when capacity
    is exhausted (usearch_reserve semantics, build.c:117-126).
    ``candidates``: see build_on_device (flat = masked dense scan pools;
    "hybrid" uses beam traversal once the live graph holds >= ``flat_until``
    nodes — the right default shape for trickle inserts into huge graphs,
    where an O(n) scan per 256-row round would dominate).
    """
    if candidates not in ("flat", "beam", "hybrid"):
        raise ValueError(
            f"candidates={candidates!r}; expected flat|beam|hybrid"
        )
    if flat_until is None:
        flat_until = 2_000_000
    import jax.numpy as jnp

    from lantern_tpu.config import QuantKind
    from lantern_tpu.graph.device import QUANT_PQ

    metric = Metric(graph.metric)
    # quantized storage (bf16 / i8 / PQ codes): run the insert rounds over
    # an f32 view and re-quantize at the end — the graph geometry is defined
    # by the stored (dequantized) values, so round-tripping is exact for
    # i8/PQ and idempotent for bf16
    restore_quant = None
    pq_cb = None
    pq_rot = None
    if graph.quant == QUANT_PQ:
        # decode codes -> f32 view. The decoded (centroid) rows ARE the
        # stored geometry the ADC search measures, so building over them is
        # exact, and re-encoding decoded rows returns the original codes
        # (each centroid is its own nearest centroid). Incoming vectors are
        # encode+decoded below so the new edges are built over exactly what
        # will be stored. HBM note: the f32 view costs dim*4 B/row for the
        # duration of the insert (vs S B/row of codes).
        from lantern_tpu.quant.pq import _encode_jit

        restore_quant = "pq"
        pq_cb = graph.pq_codebook  # [S, K, dsub]
        pq_rot = graph.pq_rotation  # OPQ rotation (or None)
        s_pq, _, dsub = pq_cb.shape
        codes = graph.vectors  # [cap, S] uint8
        # the decoded view stays in the ROTATED space (same geometry —
        # rotation is an isometry); incoming vectors are rotated+snapped
        # below, and the final re-encode therefore needs no rotation
        dec = pq_cb[jnp.arange(s_pq)[None, :], codes.astype(jnp.int32)]
        graph = graph.replace(
            vectors=dec.reshape(codes.shape[0], s_pq * dsub),
            pq_codebook=None,
            pq_rotation=None,
        )
        codes_new = _encode_jit(
            jnp.asarray(np.asarray(vectors), jnp.float32), pq_cb, pq_rot
        )
        dec_new = pq_cb[jnp.arange(s_pq)[None, :], codes_new.astype(jnp.int32)]
        vectors = np.asarray(dec_new.reshape(codes_new.shape[0], s_pq * dsub))
    if graph.quant == int(QuantKind.I8):
        restore_quant = QuantKind.I8
        f32_vecs = graph.vectors.astype(jnp.float32) * graph.vec_scales[:, None]
        graph = graph.replace(vectors=f32_vecs, vec_scales=None)
    elif graph.vectors.dtype in (jnp.bfloat16, jnp.float16):
        restore_quant = graph.vectors.dtype
        graph = graph.replace(vectors=graph.vectors.astype(jnp.float32))
    np_dtype = np.uint32 if metric == Metric.HAMMING else np.float32
    vectors = np.ascontiguousarray(np.asarray(vectors), np_dtype)
    b_new, dim = vectors.shape
    n0 = int(graph.num_nodes)
    m = graph.m
    need = n0 + b_new
    max_in = max_in or max(4, m // 2)
    if labels is None:
        labels = np.arange(n0, need, dtype=np.uint64)

    # ---- grow arrays (amortized doubling) ----
    cap = graph.cap
    new_cap = cap
    while new_cap < need:
        new_cap = max(8, new_cap * 2)
    rng = np.random.default_rng(seed + n0)
    u = np.maximum(rng.random(b_new), 1e-300)
    lam = 1.0 / np.log(m)
    new_levels = np.minimum((-np.log(u) * lam).astype(np.int64), LMAX).astype(np.int32)

    old_slots = np.asarray(graph.upper_slot[:n0])
    n_upper0 = int(old_slots.max()) + 1 if (old_slots >= 0).any() else 0
    add_upper = int((new_levels >= 1).sum())
    new_slot = np.full(b_new, -1, np.int32)
    new_slot[new_levels >= 1] = n_upper0 + np.arange(add_upper, dtype=np.int32)
    ucap_old = graph.upper_neighbors.shape[0]
    ucap_new = max(ucap_old, n_upper0 + add_upper + 1)

    def pad(arr, rows, fill):
        extra = rows - arr.shape[0]
        if extra <= 0:
            return arr
        pad_block = jnp.full((extra,) + arr.shape[1:], fill, arr.dtype)
        return jnp.concatenate([arr, pad_block], axis=0)

    vecs = pad(graph.vectors, new_cap, 0)
    vecs = jax.lax.dynamic_update_slice_in_dim(vecs, jnp.asarray(vectors), n0, axis=0)
    sqn = pad(graph.sq_norms, new_cap, 0)
    if metric == Metric.HAMMING:
        new_sq = jnp.zeros((b_new,), jnp.float32)
    else:
        vf = jnp.asarray(vectors)
        new_sq = jnp.einsum("nd,nd->n", vf, vf)
    sqn = jax.lax.dynamic_update_slice_in_dim(sqn, new_sq, n0, axis=0)
    nbr0 = graph.neighbors0
    if new_cap != cap:  # re-pad with the dummy row at the new cap position
        nbr0 = jnp.concatenate(
            [nbr0[:cap], jnp.full((new_cap + 1 - cap, 2 * m), -1, jnp.int32)], axis=0
        )
    levels = pad(graph.levels, new_cap, 0)
    levels = jax.lax.dynamic_update_slice_in_dim(
        levels, jnp.asarray(new_levels), n0, axis=0
    )
    slots = pad(graph.upper_slot, new_cap, -1)
    slots = jax.lax.dynamic_update_slice_in_dim(
        slots, jnp.asarray(new_slot), n0, axis=0
    )
    # Keep exactly the n_upper0 REAL slots and append blank ones. Slicing
    # ucap_old-1 would assume a trailing dummy scratch slot, but graphs from
    # to_device()/load_snapshot carry no dummy — that slice silently wiped
    # the highest-slot node's upper adjacency on host-built graphs.
    upper = jnp.concatenate(
        [graph.upper_neighbors[:n_upper0],
         jnp.full((ucap_new - n_upper0, LMAX, m), -1, jnp.int32)],
        axis=0,
    )
    # planned slot->id map for the grown graph (levels pre-drawn above):
    # old real slots + the batch's new upper nodes, blank-padded. Computed
    # BEFORE the rounds so beam-candidate searches take the dense entry
    # scan (mid-growth ids >= st.n are masked by the search itself).
    from lantern_tpu.graph.device import upper_ids_from_slots

    up_ids = np.full(ucap_new, -1, np.int32)
    if graph.upper_ids is not None:
        old_ids = np.asarray(graph.upper_ids)
        up_ids[:n_upper0] = old_ids[:n_upper0]
    else:
        up_ids[:n_upper0] = upper_ids_from_slots(
            old_slots, max(n_upper0, 1)
        )[:n_upper0]
    up_ids[n_upper0 : n_upper0 + add_upper] = (
        n0 + np.nonzero(new_levels >= 1)[0].astype(np.int32)
    )
    up_ids_dev = jnp.asarray(up_ids)

    st = BuildState(
        vectors=vecs, sq_norms=sqn, neighbors0=nbr0,
        upper_neighbors=upper, upper_slot=slots, levels=levels,
        entry=graph.entry, max_level=graph.max_level,
        n=jnp.asarray(n0, jnp.int32), m=m, dim=dim, metric=int(metric),
        upper_ids=up_ids_dev,
    )

    all_levels = np.asarray(levels[:need])
    level_id_arrays = []
    for lvl in range(1, int(all_levels.max()) + 1):
        lids = np.nonzero(all_levels >= lvl)[0].astype(np.int32)
        size = max(8, 1 << int(np.ceil(np.log2(len(lids)))))
        padded = np.full(size, -1, np.int32)
        padded[: len(lids)] = lids
        level_id_arrays.append(jnp.asarray(padded))
    level_tuple = tuple(level_id_arrays)

    # group consecutive rounds into one scanned dispatch (insert_rounds):
    # each dispatch through the remote-execute tunnel costs a fixed ~40 ms,
    # which would dominate small incremental inserts
    rounds = []
    pos = n0
    while pos < need:
        end = min(pos + batch, need)
        ids = np.full(batch, -1, np.int32)
        ids[: end - pos] = np.arange(pos, end, dtype=np.int32)
        rounds.append(ids)
        pos = end
    for i in range(0, len(rounds), ROUND_GROUP):
        built = n0 + i * batch  # nodes live before this group
        st = insert_rounds(st, jnp.asarray(np.stack(rounds[i : i + ROUND_GROUP])),
                           level_tuple, efc=ef_construction, max_in=max_in,
                           flat_cand=(
                               candidates == "flat"
                               or (candidates == "hybrid"
                                   and built < flat_until)
                           ))

    from lantern_tpu.graph.device import split_labels

    old_labels = graph.labels[:n0]
    lab = jnp.concatenate(
        [old_labels, jnp.asarray(split_labels(labels)),
         jnp.zeros((new_cap - need, 2), jnp.uint32)], axis=0
    )
    deleted = jnp.concatenate(
        [graph.deleted[:n0], jnp.zeros((new_cap - n0,), bool)], axis=0
    )
    # restore the original storage quantization (exact for i8 round trips,
    # idempotent for bf16 — existing rows were already representable)
    out_vecs = st.vectors
    out_scales = None
    if restore_quant == "pq":
        from lantern_tpu.quant.pq import _encode_jit

        # exact round trip: old rows are decoded centroids (re-encode is
        # identity), new rows were pre-snapped to their centroids above
        out_vecs = _encode_jit(st.vectors, pq_cb)
    elif restore_quant == QuantKind.I8:
        from lantern_tpu.quant.scalar import quantize_i8

        out_vecs, out_scales = quantize_i8(st.vectors)
    elif restore_quant is not None:
        out_vecs = st.vectors.astype(restore_quant)
    # slot->id map for the new total (computed before the rounds above)
    return DeviceGraph(
        vectors=out_vecs, sq_norms=st.sq_norms, neighbors0=st.neighbors0,
        upper_neighbors=st.upper_neighbors, upper_slot=st.upper_slot,
        levels=st.levels, labels=lab, deleted=deleted,
        entry=st.entry, max_level=st.max_level,
        num_nodes=jnp.asarray(need, jnp.int32),
        upper_ids=st.upper_ids,  # up_ids_dev's buffer was donated with st
        m=m, dim=graph.dim, metric=int(metric), quant=graph.quant,
        vec_scales=out_scales,
        pq_codebook=pq_cb,
        pq_rotation=pq_rot,
        use_pallas=graph.use_pallas,
    )


def build_on_device(
    vectors: np.ndarray,
    params: HnswParams,
    batch: int = 256,
    seed: int = 0,
    max_in: int | None = None,
    labels: np.ndarray | None = None,
    progress_cb=None,
    candidates: str = "flat",
    donate: bool = False,
    store: str = "f32",
    flat_until: int | None = None,
) -> DeviceGraph:
    """Build an HNSW graph for ``vectors`` entirely on device.

    ``donate``: a device-resident ``vectors`` array is consumed in place
    (no defensive copy — the caller's reference becomes invalid). At 10M
    rows the copy is ~5 GB of HBM, the difference between fitting one
    chip or not.

    ``store``: "f32" (default) or "bf16" — the build-state vector table
    dtype (l2sq/cos only). bf16 is the 10M-scale mode: the table argument
    halves and the per-dispatch bf16 gather-view temp (_gather_view)
    vanishes — together ~4.8 GB of HBM at 10M x 128d. Construction
    distances already flow through bf16 gathers in f32 mode (see
    _gather_view: recall measured unchanged); the returned DeviceGraph
    stores bf16 vectors, the preferred search dtype anyway.

    Supports l2sq/cos over f32 (apply bf16/i8/PQ storage after build via
    to_device-style conversion). Returns a search-ready DeviceGraph.

    ``candidates``: "flat" (default) generates each round's candidate pool
    with a masked dense MXU scan of the built prefix — near-exact efc-NN
    pools, no serialized in-loop gathers (see _insert_round); "beam" uses
    batched HNSW traversal of the partial graph (the reference's
    construction semantics, usearch_add's search phase); "hybrid" runs
    flat pools while the built prefix is below ``flat_until`` nodes and
    beam traversal after — the flat scan is O(prefix) per round (it is
    why 10M builds are ~5x slower per insert than 1M), while beam rounds
    are prefix-size-independent, so the crossover favors beam late in
    very large builds. The early flat-built core also gives the beam
    phase a high-quality graph to traverse.

    ``flat_until``: node-count threshold for candidates="hybrid"
    (default 2_000_000 — the measured flat/beam round-cost crossover on
    v5e at 128d, batch=1024).

    ``progress_cb(frac)`` is invoked with build progress in [0, 1] — the
    analog of the reference's pg_stat_progress_create_index phases
    (hnsw.c:43-57) and the CLI's percent callbacks (pq/mod.rs:26-56).
    """
    if candidates not in ("flat", "beam", "hybrid"):
        raise ValueError(
            f"candidates={candidates!r}; expected flat|beam|hybrid"
        )
    if flat_until is None:
        flat_until = 2_000_000
    if store not in ("f32", "bf16"):
        raise ValueError(f"store={store!r}; expected f32|bf16")
    metric = Metric(params.metric)
    if metric == Metric.HAMMING:
        store_dtype = jnp.uint32
    else:
        store_dtype = jnp.bfloat16 if store == "bf16" else jnp.float32
    if isinstance(vectors, jax.Array):
        # device-resident input: no host round trip (host<->device transfers
        # are the expensive path). Copy on device — the build state is
        # DONATED through the insert rounds, which would otherwise
        # invalidate the caller's array — unless the caller donates it.
        if donate and vectors.dtype == store_dtype:
            vec_dev = vectors
        else:
            vec_dev = jnp.array(vectors, dtype=store_dtype, copy=True)
    else:
        np_dtype = np.uint32 if metric == Metric.HAMMING else np.float32
        vec_dev = jnp.asarray(np.ascontiguousarray(vectors, np_dtype))
        if vec_dev.dtype != store_dtype:
            vec_dev = vec_dev.astype(store_dtype)
    n, dim = vec_dev.shape
    m = params.m
    max_in = max_in or max(4, m // 2)
    batch = min(batch, n)

    # host-side level draws + upper slot assignment (insert.c:32-46 law)
    rng = np.random.default_rng(seed)
    u = np.maximum(rng.random(n), 1e-300)
    levels = np.minimum(
        (-np.log(u) * params.level_lambda).astype(np.int64), LMAX
    ).astype(np.int32)
    has_upper = levels >= 1
    upper_slot = np.full(n, -1, np.int32)
    upper_slot[has_upper] = np.arange(int(has_upper.sum()), dtype=np.int32)
    ucap = int(has_upper.sum()) + 1  # +1 dummy slot for masked writes

    if metric == Metric.HAMMING:
        sq = jnp.zeros((n,), jnp.float32)
    else:
        sq = jnp.einsum("nd,nd->n", vec_dev, vec_dev,
                        preferred_element_type=jnp.float32)
    first = next(ramped_batches(n, batch))[1]  # first round's live count
    from lantern_tpu.graph.device import upper_ids_from_slots

    planned_upper_ids = jnp.asarray(upper_ids_from_slots(upper_slot, ucap))
    st = BuildState(
        vectors=vec_dev,
        sq_norms=sq,
        neighbors0=jnp.full((n + 1, 2 * m), -1, jnp.int32),
        upper_neighbors=jnp.full((ucap, LMAX, m), -1, jnp.int32),
        upper_slot=jnp.asarray(upper_slot),
        levels=jnp.asarray(levels),
        entry=jnp.asarray(int(np.argmax(levels[:first])), jnp.int32),
        max_level=jnp.asarray(int(levels[:first].max()), jnp.int32),
        n=jnp.asarray(0, jnp.int32),
        m=m,
        dim=params.dim,
        metric=int(metric),
        upper_ids=planned_upper_ids,
    )

    # per-level id lists (level_ids[l-1] = ids with level >= l, -1 padded to
    # a stable static size so jit compiles once per level count). The exact
    # upper-pool distance matmul is O(B * len(lids) * dim) per round, so
    # huge level-1 lists (10M-scale builds) are subsampled — upper layers
    # are navigation aids and tolerate it.
    UPPER_POOL_CAP = 32768
    level_id_arrays = []
    for lvl in range(1, LMAX + 1):
        lids = np.nonzero(levels >= lvl)[0].astype(np.int32)
        if len(lids) == 0:
            break
        if len(lids) > UPPER_POOL_CAP:
            lids = np.sort(rng.choice(lids, UPPER_POOL_CAP, replace=False))
        size = max(8, 1 << int(np.ceil(np.log2(len(lids)))))
        padded = np.full(size, -1, np.int32)
        padded[: len(lids)] = lids
        level_id_arrays.append(jnp.asarray(padded))

    # rounds; the first round's graph is empty so the within-batch pool does
    # all the linking (an exact pruned kNN seed graph)
    # always pass the full level tuple: nearly every round contains a node of
    # near-max level anyway, and a single static level count means ONE compile
    level_tuple = tuple(level_id_arrays)
    last_pct = -1
    built = 0  # nodes inserted before the current group (hybrid switch)
    for ids2d, done in _grouped_round_ids(n, batch):
        st = insert_rounds(
            st,
            jnp.asarray(ids2d),
            level_tuple,
            efc=params.ef_construction,
            max_in=max_in,
            flat_cand=(
                candidates == "flat"
                or (candidates == "hybrid" and built < flat_until)
            ),
        )
        built = done
        if progress_cb is not None:
            pct = done * 100 // n
            if pct != last_pct:
                last_pct = pct
                progress_cb(done / n)

    if labels is None:
        labels_np = np.arange(n, dtype=np.uint64)
    else:
        labels_np = np.asarray(labels, np.uint64)
    from lantern_tpu.graph.device import split_labels, upper_ids_from_slots

    return DeviceGraph(
        vectors=st.vectors,
        sq_norms=st.sq_norms,
        neighbors0=st.neighbors0,
        upper_neighbors=st.upper_neighbors,
        upper_slot=st.upper_slot,
        levels=st.levels,
        labels=jnp.asarray(split_labels(labels_np)),
        deleted=jnp.zeros((n,), bool),
        entry=st.entry,
        max_level=st.max_level,
        num_nodes=jnp.asarray(n, jnp.int32),
        # NOT the pre-build planned_upper_ids object: insert_rounds donates
        # the BuildState, which deletes the original buffer — the live
        # alias is the one threaded through the rounds
        upper_ids=st.upper_ids,
        m=m,
        dim=params.dim,
        metric=int(metric),
    )

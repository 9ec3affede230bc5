"""Multi-chip sharded index: SPMD search over a device mesh.

Replaces the reference's horizontal-scaling machinery — the external indexing
server fleet + router redirect (lantern_cli/src/external_index/server.rs,
external_index_socket.c:411-447) and the GCP Batch fan-out
(lantern_cli/src/pq/gcp_batch.rs) — with JAX sharding over a Mesh:

- The node set is partitioned round-robin into S shards; each shard is an
  independent HNSW subgraph over its partition (built concurrently by the
  native engine), stacked into arrays with a leading shard axis.
- Search is a vmap over the shard axis: with the arrays sharded
  ``P("shard", ...)``, XLA partitions the vmapped program so every device
  searches its local subgraph; per-shard top-k results are tiny
  ([S, Q, k]), so the global merge costs ONE all-gather over ICI per query
  batch instead of a collective per graph hop.
- Queries can additionally be sharded over a "data" mesh axis (2-D mesh
  data × shard) for throughput scaling.

Recall characteristics: searching S subgraphs of N/S nodes each with the
same ef upper-bounds single-graph recall (each partition's exact top-k is a
subset of the global candidate pool); empirically parity holds at equal ef
(see tests/test_sharded.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.struct as struct

from lantern_tpu.config import HnswParams
from lantern_tpu.graph.device import DeviceGraph, split_labels
from lantern_tpu.graph.search import search_batched


@struct.dataclass
class ShardedIndex:
    graphs: DeviceGraph     # every array field has leading shard axis S
    global_ids: jax.Array   # [S, cap+1] int32: local slot -> global id (-1 pad)
    # full-precision rerank source for PQ shards (quantize_sharded keeps a
    # bf16 copy of the rows so two-stage search recovers exact recall — the
    # sharded analog of Index._rerank_dev / the reference's heap table that
    # always holds raw vectors beside the PQ index)
    rerank_rows: jax.Array | None = None  # [S, cap, d] bf16
    rerank_sqn: jax.Array | None = None   # [S, cap] f32
    # build params carried for lifecycle ops (save/insert); static metadata
    params: HnswParams | None = struct.field(pytree_node=False, default=None)


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize multi-host JAX (DCN) — the analog of the reference's
    router + indexing-server fleet spanning machines.

    After this, jax.devices() returns the GLOBAL device list, so make_mesh
    spans all hosts: shard-axis collectives ride ICI within a slice and DCN
    across slices, handled by XLA from the same sharding annotations.
    On Cloud TPU pods the arguments are auto-detected (pass nothing).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_shards: int | None = None, data: int = 1) -> Mesh:
    """Build a (data, shard) mesh over available devices.

    Under multi-host JAX (init_multihost / jax.distributed) the device list
    is global, so the same call produces a pod-wide mesh.
    """
    devs = np.array(jax.devices())
    total = len(devs)
    if n_shards is None:
        n_shards = total // data
    if data * n_shards > total:
        raise ValueError(f"mesh {data}x{n_shards} exceeds {total} devices")
    return Mesh(devs[: data * n_shards].reshape(data, n_shards), ("data", "shard"))


def build_sharded(
    vectors: np.ndarray,
    params: HnswParams,
    mesh: Mesh,
    labels: np.ndarray | None = None,
    seed: int = 0,
    use_native: bool = True,
    nthreads: int = 0,
) -> ShardedIndex:
    """Partition vectors round-robin over the mesh's shard axis and build one
    subgraph per shard (host side), then place the stacked arrays.
    """
    n = len(vectors)
    s = mesh.shape["shard"]
    if n < s:
        raise ValueError(f"need at least one vector per shard ({n} < {s})")
    if labels is None:
        labels = np.arange(n, dtype=np.uint64)

    if use_native:
        from lantern_tpu.native import NativeHnsw as Engine
    else:
        from lantern_tpu.graph.host_build import HostHnsw as Engine

    shards = []
    gids = []
    for si in range(s):
        idx = np.arange(si, n, s)
        eng = Engine(params, capacity=len(idx), seed=seed + si)
        kw = {"nthreads": nthreads} if use_native else {}
        eng.add(vectors[idx], labels=labels[idx], **kw)
        shards.append(eng)
        gids.append(idx.astype(np.int32))
    return _stack_engines(shards, gids, params, mesh)


def _stack_engines(shards, gids, params: HnswParams, mesh: Mesh) -> ShardedIndex:
    """Stack per-shard host engines into mesh-sharded arrays (common padded
    capacity; padding slots tombstoned so they never surface in results)."""
    from lantern_tpu.graph.host_build import LMAX
    from lantern_tpu.graph.device import _sq_norms_np, upper_ids_from_slots
    from lantern_tpu.config import Metric

    metric = Metric(params.metric)
    max_n = max(eng.n for eng in shards)
    max_u = max(max(eng.n_upper, 1) for eng in shards)
    width = shards[0].vectors.shape[1]
    S = len(shards)
    vec_np = np.zeros((S, max_n, width), shards[0].vectors.dtype)
    sqn_np = np.zeros((S, max_n), np.float32)
    nbr_np = np.full((S, max_n + 1, params.m0), -1, np.int32)
    upn_np = np.full((S, max_u, LMAX, params.m), -1, np.int32)
    slt_np = np.full((S, max_n), -1, np.int32)
    lvl_np = np.zeros((S, max_n), np.int32)
    lab_np = np.zeros((S, max_n, 2), np.uint32)
    del_np = np.zeros((S, max_n), bool)
    entry_np = np.zeros((S,), np.int32)
    maxl_np = np.zeros((S,), np.int32)
    nn_np = np.zeros((S,), np.int32)
    gid_np = np.full((S, max_n + 1), -1, np.int32)
    uid_np = np.full((S, max_u), -1, np.int32)
    for si, eng in enumerate(shards):
        ni = eng.n
        vec_np[si, :ni] = eng.vectors[:ni]
        sqn_np[si, :ni] = _sq_norms_np(eng.vectors[:ni], metric)
        nbr_np[si, :ni] = eng.neighbors0[:ni]
        nu = max(eng.n_upper, 1)
        upn_np[si, :nu] = eng.upper_neighbors[:nu]
        slt_np[si, :ni] = eng.upper_slot[:ni]
        uid_np[si] = upper_ids_from_slots(eng.upper_slot[:ni], max_u)
        lvl_np[si, :ni] = eng.levels[:ni]
        lab_np[si, :ni] = split_labels(eng.labels[:ni])
        del_np[si, :ni] = eng.deleted[:ni]
        del_np[si, ni:] = True
        entry_np[si] = eng.entry
        maxl_np[si] = eng.max_level
        nn_np[si] = ni
        gid_np[si, :ni] = gids[si][:ni]

    def put(x, spec=P("shard")):
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            # multi-host mesh: each process materializes only its
            # addressable shards (every process holds the full host arrays,
            # built deterministically from the same inputs)
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )
        return jax.device_put(jnp.asarray(x), sharding)

    graphs = DeviceGraph(
        vectors=put(vec_np),
        sq_norms=put(sqn_np),
        neighbors0=put(nbr_np),
        upper_neighbors=put(upn_np),
        upper_slot=put(slt_np),
        levels=put(lvl_np),
        labels=put(lab_np),
        deleted=put(del_np),
        entry=put(entry_np),
        max_level=put(maxl_np),
        num_nodes=put(nn_np),
        upper_ids=put(uid_np),
        m=params.m,
        dim=params.dim,
        metric=int(metric),
    )
    return ShardedIndex(graphs=graphs, global_ids=put(gid_np), params=params)


@functools.partial(jax.jit, static_argnames=("k", "ef", "expand", "max_iters"))
def search_sharded(
    index: ShardedIndex,
    queries: jax.Array,
    k: int = 10,
    ef: int = 64,
    expand: int = 1,
    max_iters: int | None = None,
    exclude_gids: jax.Array | None = None,
):
    """SPMD search: every shard searches its subgraph, one global top-k merge.

    queries [Q, width] (replicated or data-sharded) ->
    (dists [Q, k] f32, global ids [Q, k] i32, labels [Q, k, 2] u32).

    ``exclude_gids``: predicate-filtered search — either a [n_global] bool
    mask indexed by global id (translated to per-shard local masks inline),
    or the [S, cap] per-shard masks from :func:`local_exclude_masks`
    (precompute once when the same filter serves many searches: the
    gid-indexed translation is a serialized element gather on TPU).
    """
    excl = _as_local_masks(index, exclude_gids)

    def local_search(graph: DeviceGraph, gids: jax.Array, excl_row=None):
        d, ids, labels = search_batched(
            graph, queries, k=k, ef=ef, expand=expand, max_iters=max_iters,
            exclude=excl_row,
        )
        gid = jnp.where(ids >= 0, gids[jnp.clip(ids, 0, gids.shape[0] - 1)], -1)
        return d, gid, labels

    if excl is None:
        d, gid, labels = jax.vmap(local_search)(index.graphs, index.global_ids)
    else:
        d, gid, labels = jax.vmap(local_search)(
            index.graphs, index.global_ids, excl
        )
    return _merge_topk(d, gid, labels, k)


def local_exclude_masks(index: ShardedIndex, exclude_gids: jax.Array):
    """Translate a [n_global] bool global-id mask into per-shard [S, cap]
    local node masks. Semantics: blank gid slots are always excluded (they
    hold no node); gids at or beyond the mask's length are NOT excluded (a
    shorter/stale mask leaves newer inserts unfiltered rather than
    silently mapping them onto the mask's last entry).

    Precompute this once per filter and pass the result as
    ``exclude_gids`` to repeated sharded searches — the gid-indexed gather
    is a serialized element gather on TPU, comparable in cost to a whole
    search dispatch at 1M rows/shard.
    """
    cap = index.graphs.vectors.shape[1]
    n_mask = exclude_gids.shape[0]

    def one(gids):
        g = gids[:cap]
        safe = jnp.clip(g, 0, n_mask - 1)
        covered = jnp.logical_and(g >= 0, g < n_mask)
        return jnp.where(g < 0, True,
                         jnp.where(covered, exclude_gids[safe], False))

    return jax.vmap(one)(index.global_ids)


def _as_local_masks(index, exclude_gids):
    """None | [n_global] | [S, cap] -> None | [S, cap] local masks."""
    if exclude_gids is None:
        return None
    if exclude_gids.ndim == 2:
        return exclude_gids
    return local_exclude_masks(index, exclude_gids)


def _merge_topk(d, gid, labels, k: int):
    """[S, Q, k] per-shard results -> [Q, k] global top-k.

    One small cross-shard gather per query batch — the only collective in
    the sharded search program."""
    s = d.shape[0]
    q = d.shape[1]
    d2 = jnp.transpose(d, (1, 0, 2)).reshape(q, s * k)
    gid2 = jnp.transpose(gid, (1, 0, 2)).reshape(q, s * k)
    lab2 = jnp.transpose(labels, (1, 0, 2, 3)).reshape(q, s * k, 2)
    neg_top, arg = jax.lax.top_k(-jnp.where(gid2 >= 0, d2, jnp.inf), k)
    out_d = -neg_top
    out_gid = jnp.where(
        jnp.isfinite(out_d), jnp.take_along_axis(gid2, arg, axis=1), -1
    )
    out_lab = jnp.take_along_axis(lab2, arg[:, :, None], axis=1)
    out_lab = jnp.where((out_gid >= 0)[:, :, None], out_lab, jnp.uint32(0))
    return out_d, out_gid, out_lab


@functools.partial(jax.jit, static_argnames=("k", "exact", "recall_target"))
def flat_search_sharded(
    index: ShardedIndex,
    queries: jax.Array,
    k: int = 10,
    exact: bool = False,
    recall_target: float = 0.95,
    exclude_gids: jax.Array | None = None,
):
    """Sharded FLAT scan: every device MXU-scans its shard, one top-k merge.

    The multi-chip extension of the dominant single-chip path (flat.py):
    each shard's stored table streams through its own MXU, so throughput
    scales linearly with the shard axis while the merge collective stays
    [S, Q, k]. Exact per-shard top-k composes to exact global top-k; with
    approx_max_k the global recall is lower-bounded by the per-shard
    recall_target (a miss needs the true neighbor dropped by its own shard).
    PQ-coded shards run the decode-on-MXU ADC scan (flat_search_pq).
    """
    from lantern_tpu.flat import flat_search_graph

    excl = _as_local_masks(index, exclude_gids)

    def local(graph: DeviceGraph, gids: jax.Array, excl_row=None):
        d, ids, labels = flat_search_graph(
            graph, queries, k=k, exact=exact, recall_target=recall_target,
            exclude=excl_row,
        )
        gid = jnp.where(ids >= 0, gids[jnp.clip(ids, 0, gids.shape[0] - 1)], -1)
        return d, gid, labels

    if excl is None:
        d, gid, labels = jax.vmap(local)(index.graphs, index.global_ids)
    else:
        d, gid, labels = jax.vmap(local)(index.graphs, index.global_ids, excl)
    return _merge_topk(d, gid, labels, k)


@functools.partial(
    jax.jit, static_argnames=("k", "shortlist", "recall_target")
)
def flat_search_sharded_rerank(
    index: ShardedIndex,
    queries: jax.Array,
    k: int = 10,
    shortlist: int = 100,
    recall_target: float = 0.95,
    exclude_gids: jax.Array | None = None,
):
    """Sharded two-stage PQ search: per-shard ADC shortlist + exact rerank
    against each shard's bf16 row copy, then one global top-k merge.

    The multi-chip composition of flat_search_graph_rerank: every device
    scans its own codes and rescores its own shortlist rows locally, so the
    collective stays the tiny [S, Q, k] result merge. Requires a PQ-coded
    index built by :func:`quantize_sharded` with ``keep_rerank=True``.
    """
    from lantern_tpu.flat import flat_search_graph_rerank

    if index.rerank_rows is None:
        raise ValueError(
            "flat_search_sharded_rerank needs rerank rows — quantize with "
            "keep_rerank=True"
        )
    excl = _as_local_masks(index, exclude_gids)

    def local(graph: DeviceGraph, rows, sqn, gids, excl_row=None):
        d, ids, labels = flat_search_graph_rerank(
            graph, rows, sqn, queries, k=k, shortlist=shortlist,
            recall_target=recall_target, exclude=excl_row,
        )
        gid = jnp.where(ids >= 0, gids[jnp.clip(ids, 0, gids.shape[0] - 1)], -1)
        return d, gid, labels

    args = (index.graphs, index.rerank_rows, index.rerank_sqn,
            index.global_ids)
    if excl is None:
        d, gid, labels = jax.vmap(local)(*args)
    else:
        d, gid, labels = jax.vmap(local)(*args, excl)
    return _merge_topk(d, gid, labels, k)


def quantize_sharded(
    index: ShardedIndex,
    mesh: Mesh,
    quant: str = "pq",
    codebook=None,
    train_rows: int = 65536,
    keep_rerank: bool = True,
    seed: int = 0,
) -> ShardedIndex:
    """Re-encode a built f32/bf16 ShardedIndex's vector storage as PQ codes
    or i8 — composing the reference's two scale mechanisms (external-built
    index × pq/quant_bits options, build.c:497-501 + options.c:137-158) on
    the mesh. The per-shard HBM footprint drops from cap*dim*4 to cap*S
    bytes (PQ) or cap*dim (+4) bytes (i8), which is the beyond-HBM story:
    8 shards of 12.5M 128-d rows are 3.2 GB of PQ codes pod-wide instead of
    51 GB of f32.

    The encode runs per shard on its own device (shard_map, zero
    collectives); nothing round-trips through the host except an optional
    codebook-training row sample.

    - ``quant="pq"``: train (or take) a PQCodebook and store uint8 codes.
      ``keep_rerank=True`` (default) retains a bf16 copy of the rows per
      shard so :func:`flat_search_sharded_rerank` recovers full recall;
      pass False for the pure beyond-HBM footprint.
    - ``quant="i8"``: symmetric per-vector int8 codes + f32 scales; both
      beam and flat searches dequantize on the fly (no rerank needed).
    """
    from jax import shard_map

    from lantern_tpu.config import Metric, QuantKind
    from lantern_tpu.graph.device import QUANT_PQ

    g = index.graphs
    metric = Metric(g.metric)
    if metric == Metric.HAMMING:
        raise ValueError("hamming shards are already bit-packed; no PQ/i8")
    if g.quant not in (int(QuantKind.F32), int(QuantKind.F16)):
        raise ValueError("index is already quantized")
    s, cap, dim = g.vectors.shape

    if quant == "pq":
        from lantern_tpu.quant.pq import PQCodebook, train_codebook

        if codebook is None:
            # sample training rows across shards (host-side; training reads
            # the sample once — the index arrays stay on device)
            per = max(1, min(cap, train_rows // s))
            block = np.asarray(
                jax.device_get(g.vectors[:, :per, :]), np.float32
            )
            nn = np.asarray(jax.device_get(g.num_nodes))
            sample = np.concatenate(
                [block[si, : max(1, min(per, int(nn[si])))] for si in range(s)]
            )
            p = index.params
            nsub = (p.effective_num_subvectors if p is not None
                    else max(1, dim // 4))
            ncent = p.num_centroids if p is not None else 256
            codebook = train_codebook(
                sample, num_subvectors=nsub, num_centroids=min(ncent, 256),
                seed=seed, rotate=True,
            )
        cent = jnp.asarray(codebook.centroids, jnp.float32)
        rot = (jnp.asarray(codebook.rotation, jnp.float32)
               if codebook.rotation is not None else None)

        def encode_block(vec):  # [1, cap, dim] device-local block
            from lantern_tpu.quant.pq import _encode_jit

            v = vec[0].astype(jnp.float32)
            codes = _encode_jit(v, cent, rot)
            rows = v.astype(jnp.bfloat16)
            return codes[None], rows[None]

        enc = jax.jit(shard_map(
            encode_block, mesh=mesh,
            in_specs=(P("shard"),), out_specs=(P("shard"), P("shard")),
            check_vma=False,
        ))
        codes, rows_bf16 = enc(g.vectors)

        def tile(x):
            return jax.device_put(
                jnp.broadcast_to(x[None], (s,) + x.shape),
                NamedSharding(mesh, P("shard")),
            )

        new_graphs = g.replace(
            vectors=codes,
            vec_scales=None,
            pq_codebook=tile(cent),
            pq_rotation=tile(rot) if rot is not None else None,
            quant=QUANT_PQ,
        )
        p = index.params
        new_params = (dataclasses.replace(
            p, pq=True, num_subvectors=codebook.num_subvectors,
            num_centroids=codebook.num_centroids,
        ) if p is not None else None)
        return ShardedIndex(
            graphs=new_graphs,
            global_ids=index.global_ids,
            rerank_rows=rows_bf16 if keep_rerank else None,
            rerank_sqn=g.sq_norms if keep_rerank else None,
            params=new_params,
        )

    if quant == "i8":
        from lantern_tpu.quant.scalar import quantize_i8

        def encode_block(vec):
            codes, scales = quantize_i8(vec[0].astype(jnp.float32))
            return codes[None], scales[None]

        enc = jax.jit(shard_map(
            encode_block, mesh=mesh,
            in_specs=(P("shard"),), out_specs=(P("shard"), P("shard")),
            check_vma=False,
        ))
        codes, scales = enc(g.vectors)
        new_graphs = g.replace(
            vectors=codes, vec_scales=scales, quant=int(QuantKind.I8)
        )
        p = index.params
        new_params = (dataclasses.replace(p, quant=QuantKind.I8)
                      if p is not None else None)
        return ShardedIndex(
            graphs=new_graphs, global_ids=index.global_ids,
            params=new_params,
        )

    raise ValueError(f"quant={quant!r}; expected 'pq' or 'i8'")


def _sharded_rounds_fn(mesh: Mesh, st_spec, lvl_spec, efc: int, max_in: int,
                       flat_cand: bool):
    """Jitted shard_map program running grouped vmapped insert rounds —
    every device executes its own shard's rounds, zero collectives by
    construction (shared by build_sharded_device and insert_sharded)."""
    from jax import shard_map

    from lantern_tpu.graph.build_device import _insert_round

    round_core = jax.vmap(
        functools.partial(_insert_round, efc=efc, max_in=max_in,
                          flat_cand=flat_cand),
        in_axes=(0, 0, 0),
    )

    def grouped_core(st_stack, ids3d, lvls):
        # R rounds as one lax.scan -> one dispatch per group (fixed
        # per-dispatch cost; same grouping as build_on_device)
        def body(stk, ids2d):
            return round_core(stk, ids2d, lvls), None

        stk, _ = jax.lax.scan(body, st_stack, ids3d)
        return stk

    # donation matters on TPU (the build state is the HBM budget); on the
    # CPU backend it buys nothing and donated shard_map executables have
    # shown compiler instability late in long processes (r3 suite crashes)
    donate = () if jax.default_backend() == "cpu" else (0,)
    return jax.jit(
        shard_map(
            grouped_core, mesh=mesh,
            in_specs=(st_spec, P(None, "shard"), lvl_spec),
            out_specs=st_spec,
            check_vma=False,
        ),
        donate_argnums=donate,
    )


def build_sharded_device(
    vectors: np.ndarray,
    params: HnswParams,
    mesh: Mesh,
    batch: int = 256,
    seed: int = 0,
    labels: np.ndarray | None = None,
    max_in: int | None = None,
    candidates: str = "flat",
    store: str = "f32",
    flat_until: int | None = None,
) -> ShardedIndex:
    """Build all shard subgraphs IN PARALLEL on the mesh's devices.

    The TPU analog of the reference's external indexing *fleet* (router +
    N indexing servers each building a partition): the batched insert round
    (graph/build_device.py) is vmapped over the shard axis, so with the
    stacked build state sharded P("shard") every device executes its own
    round concurrently — S devices build S subgraphs in the wall-clock of
    one. No cross-device traffic during build (subgraphs are independent);
    search later pays one top-k merge collective (search_sharded).

    ``candidates``: "flat" (default) scans each shard's built prefix with
    one masked dense MXU matmul for the candidate pools (the single-chip
    builder's fast path — shard-local, still zero collectives); "beam"
    keeps batched HNSW traversal of the partial subgraph; "hybrid"
    switches each shard from flat to beam once its built prefix reaches
    ``flat_until`` nodes (default 2M — see build_on_device; relevant when
    per-shard size exceeds a few million rows).

    ``store``: "f32" (default) or "bf16" build-state vector tables (l2sq/cos
    only) — the per-device HBM halving that lets a v5e-8 pod hold ~80M
    128-d rows during the build (see build_on_device's store docs; recall
    parity measured on the single-chip path).
    """
    if candidates not in ("flat", "beam", "hybrid"):
        raise ValueError(
            f"candidates={candidates!r}; expected flat|beam|hybrid"
        )
    if flat_until is None:
        flat_until = 2_000_000
    if store not in ("f32", "bf16"):
        raise ValueError(f"store={store!r}; expected f32|bf16")
    from lantern_tpu.config import Metric
    from lantern_tpu.graph.build_device import BuildState
    from lantern_tpu.graph.host_build import LMAX

    metric = Metric(params.metric)
    # hamming builds over packed u32 words (dim = words, distances via
    # XOR+popcount in _insert_round — build_device.py:93-104)
    np_dtype = np.uint32 if metric == Metric.HAMMING else np.float32
    vectors = np.ascontiguousarray(vectors, np_dtype)
    n, dim = vectors.shape
    s = mesh.shape["shard"]
    if n < s:
        raise ValueError(f"need at least one vector per shard ({n} < {s})")
    m = params.m
    max_in = max_in or max(4, m // 2)
    if labels is None:
        labels = np.arange(n, dtype=np.uint64)

    part = [np.arange(si, n, s) for si in range(s)]
    nmax = max(len(pp) for pp in part)
    batch = min(batch, nmax)

    rng = np.random.default_rng(seed)
    lvl_np = np.zeros((s, nmax), np.int32)
    slot_np = np.full((s, nmax), -1, np.int32)
    vec_np = np.zeros((s, nmax, dim), np_dtype)
    gid_np = np.full((s, nmax + 1), -1, np.int32)
    lab_np = np.zeros((s, nmax), np.uint64)
    n_upper_max = 1
    for si, ids in enumerate(part):
        ni = len(ids)
        vec_np[si, :ni] = vectors[ids]
        gid_np[si, :ni] = ids
        lab_np[si, :ni] = labels[ids]
        u = np.maximum(rng.random(ni), 1e-300)
        lv = np.minimum((-np.log(u) * params.level_lambda).astype(np.int64), LMAX)
        lvl_np[si, :ni] = lv
        has = lv >= 1
        slot_np[si, :ni][has] = np.arange(int(has.sum()), dtype=np.int32)
        n_upper_max = max(n_upper_max, int(has.sum()))
    ucap = n_upper_max + 1  # + dummy slot

    # per-level id lists, padded to a common static size across shards;
    # huge level-1 lists are subsampled (see build_on_device's UPPER_POOL_CAP)
    UPPER_POOL_CAP = 32768
    global_max_lvl = int(lvl_np.max())
    level_arrays = []
    for lvl in range(1, global_max_lvl + 1):
        per_shard = []
        for si in range(s):
            lids = np.nonzero(lvl_np[si] >= lvl)[0].astype(np.int32)
            if len(lids) > UPPER_POOL_CAP:
                lids = np.sort(rng.choice(lids, UPPER_POOL_CAP, replace=False))
            per_shard.append(lids)
        size = max(8, 1 << int(np.ceil(np.log2(max(max(len(x) for x in per_shard), 1)))))
        arr = np.full((s, size), -1, np.int32)
        for si in range(s):
            arr[si, : len(per_shard[si])] = per_shard[si]
        level_arrays.append(arr)

    def put(x, spec=P("shard")):
        # device_put takes host arrays directly: each device receives only
        # its own shard (jnp.asarray first would stage the FULL array on the
        # default device — an HBM spike exactly when sharding is the point)
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    if metric == Metric.HAMMING:
        sq = np.zeros((s, nmax), np.float32)  # unused by hamming distances
    else:
        sq = np.einsum("snd,snd->sn", vec_np, vec_np).astype(np.float32)
    from lantern_tpu.graph.build_device import ramped_batches

    first = next(ramped_batches(nmax, batch))[1]
    entry0 = np.array(
        [int(np.argmax(lvl_np[si, : min(first, len(part[si]))])) for si in range(s)],
        np.int32,
    )
    maxl0 = np.array(
        [int(lvl_np[si, : min(first, len(part[si]))].max()) for si in range(s)],
        np.int32,
    )
    if store == "bf16" and metric != Metric.HAMMING:
        # cast on HOST before placement (numpy handles ml_dtypes.bfloat16):
        # sq_norms above came from the f32 copy, and no device ever holds
        # the f32 table — the point of store="bf16" is per-device HBM
        vec_dev = put(vec_np.astype(jnp.bfloat16))
    else:
        vec_dev = put(vec_np)
    st = BuildState(
        vectors=vec_dev,
        sq_norms=put(sq),
        neighbors0=put(np.full((s, nmax + 1, 2 * m), -1, np.int32)),
        upper_neighbors=put(np.full((s, ucap, LMAX, m), -1, np.int32)),
        upper_slot=put(slot_np),
        levels=put(lvl_np),
        entry=put(entry0),
        max_level=put(maxl0),
        n=put(np.zeros(s, np.int32)),
        m=m,
        dim=dim,
        metric=int(metric),
    )
    level_tuple_dev = tuple(put(a) for a in level_arrays)

    # Explicit SPMD via shard_map: each device runs its own insert round
    # over its shard slice — the program contains ZERO collectives by
    # construction. Leaving this to jit+vmap lets the SPMD partitioner
    # re-shard heavy intermediates over the OTHER mesh axes and insert
    # all-gather/all-reduce pairs; on the virtual CPU mesh the in-process
    # rendezvous for those deadlocks intermittently (40 s hard abort).
    st_spec = jax.tree_util.tree_map(lambda _: P("shard"), st)
    lvl_spec = tuple(P("shard") for _ in level_tuple_dev)

    def _make_rounds_fn(flat_cand: bool):
        return _sharded_rounds_fn(
            mesh, st_spec, lvl_spec, efc=params.ef_construction,
            max_in=max_in, flat_cand=flat_cand,
        )

    # hybrid switches each shard's pool kind at flat_until built nodes —
    # both variants compile at most once (lazily, only if reached)
    _rounds_fns: dict = {}

    def rounds_fn_for(group_start_pos: int):
        fc = (
            candidates == "flat"
            or (candidates == "hybrid" and group_start_pos < flat_until)
        )
        if fc not in _rounds_fns:
            _rounds_fns[fc] = _make_rounds_fn(fc)
        return _rounds_fns[fc]

    from lantern_tpu.graph.build_device import ROUND_GROUP, ramped_batches

    def put_ids(ids3d):
        return jax.device_put(
            jnp.asarray(ids3d), NamedSharding(mesh, P(None, "shard"))
        )

    prev_shape = None
    pending: list[np.ndarray] = []
    group_start = 0  # per-shard built count when the pending group began
    for pos, live, size in ramped_batches(nmax, batch):
        end = pos + live
        ids = np.full((s, size), -1, np.int32)
        for si in range(s):
            hi = min(end, len(part[si]))
            if hi > pos:
                ids[si, : hi - pos] = np.arange(pos, hi, dtype=np.int32)
        if pending and (size != pending[0].shape[1]
                        or len(pending) == ROUND_GROUP
                        or (candidates == "hybrid"
                            and group_start < flat_until <= pos)):
            shape = (len(pending), pending[0].shape[1])
            if shape != prev_shape and prev_shape is not None:
                # a new ids shape means rounds_fn recompiles on the host
                # thread; on a single-core host (virtual CPU mesh) a long
                # compile starves the PREVIOUS group's in-flight execution
                # rendezvous past XLA's 40 s hard deadline (process abort).
                # Drain execution before tracing the new shape.
                jax.block_until_ready(st.n)
            prev_shape = shape
            st = rounds_fn_for(group_start)(
                st, put_ids(np.stack(pending)), level_tuple_dev
            )
            pending = []
            group_start = pos
        pending.append(ids)
    if pending:
        shape = (len(pending), pending[0].shape[1])
        if shape != prev_shape and prev_shape is not None:
            jax.block_until_ready(st.n)
        st = rounds_fn_for(group_start)(
            st, put_ids(np.stack(pending)), level_tuple_dev
        )

    from lantern_tpu.graph.device import split_labels

    lab_pairs = split_labels(lab_np.reshape(-1)).reshape(s, nmax, 2)
    deleted = gid_np[:, :nmax] < 0  # padding slots tombstoned
    from lantern_tpu.graph.device import upper_ids_from_slots

    uid_np = np.stack(
        [upper_ids_from_slots(slot_np[si], ucap) for si in range(s)]
    )
    graphs = DeviceGraph(
        vectors=st.vectors,
        sq_norms=st.sq_norms,
        neighbors0=st.neighbors0,
        upper_neighbors=st.upper_neighbors,
        upper_slot=st.upper_slot,
        levels=st.levels,
        labels=put(lab_pairs),
        deleted=put(deleted),
        entry=st.entry,
        max_level=st.max_level,
        num_nodes=put(np.array([len(pp) for pp in part], np.int32)),
        upper_ids=put(uid_np),
        m=m,
        dim=dim,
        metric=int(metric),
    )
    return ShardedIndex(graphs=graphs, global_ids=put(gid_np), params=params)


# ---- lifecycle: save / load / insert / delete ------------------------------
# The reference's external fleet persists by streaming each server's index
# file back (server.rs:377-434); a sharded index here persists as one
# standard snapshot per shard plus a manifest, so every shard file is
# independently loadable by the single-index tooling.


class _ShardView:
    """Duck-typed engine view over one shard's arrays (for save_snapshot).

    Quantized shards are viewed through their SOURCE rows — the bf16 rerank
    copy (PQ with keep_rerank), the decoded centroids (PQ without), or the
    exactly-dequantized f32 rows (i8) — so every shard file stays loadable
    by the single-index tooling; load_sharded re-encodes on the mesh."""

    def __init__(self, index: ShardedIndex, si: int):
        from lantern_tpu.config import QuantKind
        from lantern_tpu.graph.device import QUANT_PQ

        g = jax.device_get(jax.tree.map(lambda a: a[si], index.graphs))
        self.p = index.params
        self.n = int(g.num_nodes)
        self.entry = int(g.entry)
        self.max_level = int(g.max_level)
        if g.quant == QUANT_PQ:
            if index.rerank_rows is not None:
                self.vectors = np.asarray(
                    jax.device_get(index.rerank_rows[si])
                )
            else:
                from lantern_tpu.quant.pq import PQCodebook, pq_decode

                cb = PQCodebook(
                    centroids=np.asarray(g.pq_codebook),
                    rotation=(np.asarray(g.pq_rotation)
                              if g.pq_rotation is not None else None),
                )
                self.vectors = pq_decode(np.asarray(g.vectors), cb)
        elif g.quant == int(QuantKind.I8):
            from lantern_tpu.quant.scalar import dequantize_i8

            self.vectors = np.asarray(
                dequantize_i8(jnp.asarray(g.vectors),
                              jnp.asarray(g.vec_scales))
            )
        else:
            self.vectors = np.asarray(g.vectors)
        self.neighbors0 = np.asarray(g.neighbors0)
        self.counts0 = (self.neighbors0 >= 0).sum(1).astype(np.int32)
        self.upper_neighbors = np.asarray(g.upper_neighbors)
        self.upper_counts = (self.upper_neighbors >= 0).sum(-1).astype(np.int32)
        slots = np.asarray(g.upper_slot[: self.n])
        used = slots[slots >= 0]
        self.n_upper = int(used.max()) + 1 if used.size else 0
        self.upper_slot = np.asarray(g.upper_slot)
        self.levels = np.asarray(g.levels)
        from lantern_tpu.graph.device import join_labels

        self.labels = join_labels(np.asarray(g.labels))
        self.deleted = np.asarray(g.deleted)


def _sharded_codebook(index: ShardedIndex):
    """PQCodebook reconstructed from the (replicated) device copy, or None."""
    g = index.graphs
    if g.pq_codebook is None:
        return None
    from lantern_tpu.quant.pq import PQCodebook

    return PQCodebook(
        centroids=np.asarray(jax.device_get(g.pq_codebook[0])),
        rotation=(np.asarray(jax.device_get(g.pq_rotation[0]))
                  if g.pq_rotation is not None else None),
    )


def save_sharded(index: ShardedIndex, dir_path: str):
    """Persist: manifest.json + shard_<i>.ldb (standard snapshots) +
    shard_<i>.gids.npy (local slot -> global id).

    Quantized indexes persist their source rows per shard (see _ShardView)
    plus the codebook inside every shard file; the manifest records the
    quant kind so load_sharded re-encodes on the mesh."""
    import json
    import os

    from lantern_tpu.config import QuantKind
    from lantern_tpu.graph.device import QUANT_PQ
    from lantern_tpu.storage.snapshot import save_snapshot

    if index.params is None:
        raise ValueError("ShardedIndex has no params; cannot save")
    os.makedirs(dir_path, exist_ok=True)
    s = index.global_ids.shape[0]
    gids = np.asarray(jax.device_get(index.global_ids))
    codebook = _sharded_codebook(index)
    for si in range(s):
        view = _ShardView(index, si)
        save_snapshot(view, os.path.join(dir_path, f"shard_{si}.ldb"),
                      pq_codebook=codebook)
        np.save(os.path.join(dir_path, f"shard_{si}.gids.npy"), gids[si])
    quant_kind = None
    if index.graphs.quant == QUANT_PQ:
        quant_kind = "pq"
    elif index.graphs.quant == int(QuantKind.I8):
        quant_kind = "i8"
    manifest = {"version": 2, "n_shards": s,
                "dim": index.params.dim, "m": index.params.m,
                "metric": int(index.params.metric),
                "quant": quant_kind,
                "keep_rerank": index.rerank_rows is not None}
    tmp = os.path.join(dir_path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dir_path, "manifest.json"))


def load_sharded(dir_path: str, mesh: Mesh, engine: str = "native") -> ShardedIndex:
    """Load a save_sharded directory back onto a mesh (shard count must
    divide the mesh's shard axis... must EQUAL it for now)."""
    import json
    import os

    from lantern_tpu.storage.snapshot import load_snapshot

    with open(os.path.join(dir_path, "manifest.json")) as f:
        manifest = json.load(f)
    s = manifest["n_shards"]
    if mesh.shape["shard"] != s:
        raise ValueError(
            f"snapshot has {s} shards but mesh shard axis is "
            f"{mesh.shape['shard']}"
        )
    quant_kind = manifest.get("quant")
    shards, gids = [], []
    params = None
    codebook = None
    for si in range(s):
        eng, cb = load_snapshot(os.path.join(dir_path, f"shard_{si}.ldb"),
                                engine=engine, return_codebook=True)
        params = eng.p
        codebook = codebook or cb
        g = np.load(os.path.join(dir_path, f"shard_{si}.gids.npy"))
        shards.append(eng)
        gids.append(g[g >= 0][: eng.n])
    if quant_kind == "pq":
        # stack unquantized, then re-encode on the mesh with the persisted
        # codebook (codes from bf16 source rows are quality-equivalent)
        base_params = dataclasses.replace(params, pq=False)
        ix = _stack_engines(shards, gids, base_params, mesh)
        return quantize_sharded(
            ix, mesh, quant="pq", codebook=codebook,
            keep_rerank=manifest.get("keep_rerank", True),
        )
    if quant_kind == "i8":
        from lantern_tpu.config import QuantKind

        base_params = dataclasses.replace(params, quant=QuantKind.F32)
        ix = _stack_engines(shards, gids, base_params, mesh)
        return quantize_sharded(ix, mesh, quant="i8")
    return _stack_engines(shards, gids, params, mesh)


def _unstack_shard(index: ShardedIndex, si: int) -> DeviceGraph:
    """One shard's arrays as a standalone (unsharded) DeviceGraph."""
    return jax.tree.map(lambda a: jnp.asarray(jax.device_get(a[si])),
                        index.graphs)


def insert_sharded(
    index: ShardedIndex,
    vectors: np.ndarray,
    mesh: Mesh,
    labels: np.ndarray | None = None,
    batch: int = 256,
    seed: int = 0,
    candidates: str = "flat",
    flat_until: int = 2_000_000,
) -> ShardedIndex:
    """Post-build insert ON the mesh: route new vectors to their round-robin
    owner shard (owner = global_id % S, the build partitioning), grow and
    scatter the stacked arrays device-side, and run the SAME vmapped insert
    rounds as build_sharded_device — all shards concurrently, zero
    collectives.

    No full-graph host copy: the vector and adjacency arrays never leave
    the devices (the previous implementation round-tripped every shard
    through device_get + standalone device_insert + re-stack — S full
    copies per trickle insert). Host traffic is the new rows plus O(cap)
    METADATA (levels and global ids, ~8 B/row vs ~640 B/row for the full
    copy) needed to rebuild the per-level candidate pools.

    Reference analog: the external fleet ingests concurrently,
    server.rs:311-375.
    """
    from lantern_tpu.config import Metric, QuantKind
    from lantern_tpu.graph.build_device import BuildState
    from lantern_tpu.graph.host_build import LMAX
    from lantern_tpu.graph.device import split_labels as _split

    from lantern_tpu.graph.device import QUANT_PQ

    if index.params is None:
        raise ValueError("ShardedIndex has no params; cannot insert")
    if index.graphs.upper_ids is None:
        raise ValueError(
            "insert_sharded requires graphs.upper_ids (all lantern_tpu "
            "constructors set it)"
        )
    params = index.params
    g = index.graphs
    metric = Metric(g.metric)
    # quantized shards (PQ / i8): the insert rounds run over an f32 view of
    # the STORED geometry (decoded centroids resp. dequantized codes —
    # what the quantized searches measure), rebuilt per shard on its own
    # device, and the storage re-encodes at the end (exact round trip for
    # existing rows; incoming rows are snapped first for PQ). Same
    # semantics as the single-chip device_insert PQ/i8 path.
    quant_mode = None
    if g.quant == QUANT_PQ:
        quant_mode = "pq"
    elif g.quant == int(QuantKind.I8):
        quant_mode = "i8"
    elif g.quant not in (
        int(QuantKind.F32), int(QuantKind.F16), int(QuantKind.B1),
    ):
        raise NotImplementedError(
            f"insert into a quant={g.quant} ShardedIndex is not supported"
        )
    # B1 needs no f32 view or re-encode: packed u32 words ARE the stored
    # geometry and the insert rounds run hamming over them directly (same
    # as the single-chip device_insert path; closes the quant x sharding
    # matrix — reference insert.c works for every quant_bits kind).
    np_dtype = np.uint32 if metric == Metric.HAMMING else np.float32
    vectors = np.ascontiguousarray(vectors, np_dtype)
    b, width = vectors.shape
    s, cap = g.vectors.shape[0], g.vectors.shape[1]
    m = g.m
    max_in = max(4, m // 2)

    codebook = None
    true_rows = None
    if quant_mode == "pq":
        from lantern_tpu.quant.pq import pq_encode

        codebook = _sharded_codebook(index)
        if codebook is None or codebook.dim != width:
            raise ValueError("PQ shard codebook missing or dim mismatch")
        # snap incoming rows to their centroids in the ROTATED space — the
        # new edges are built over exactly what will be stored, and the
        # final re-encode of these rows is the identity
        true_rows = vectors.copy()  # original-space rows (rerank source)
        codes_new = pq_encode(vectors, codebook)
        cb_c = codebook.centroids
        vectors = cb_c[
            np.arange(cb_c.shape[0])[None, :], codes_new
        ].reshape(b, width).astype(np.float32)

    # --- small device fetches: counts, per-shard upper-slot highwater ---
    nn = np.asarray(jax.device_get(g.num_nodes)).astype(np.int64)  # [S]
    nup = np.asarray(jax.device_get(
        jax.jit(lambda us: jnp.max(us, axis=1))(g.upper_slot)
    )).astype(np.int64) + 1  # [S] real upper-slot count (0 if none)
    nup = np.maximum(nup, 0)
    n_global = int(jax.device_get(jnp.max(index.global_ids)))
    new_gids = np.arange(n_global + 1, n_global + 1 + b)
    if labels is None:
        labels = new_gids.astype(np.uint64)
    labels = np.asarray(labels, np.uint64)

    # --- route to owner shards ---
    owner = (new_gids % s).astype(np.int64)
    b_si = np.bincount(owner, minlength=s)
    bmax = int(b_si.max())
    if bmax == 0:
        return index
    # pad the per-shard block to a power of two: bounds distinct jit shapes
    bpad = max(8, 1 << int(np.ceil(np.log2(bmax))))
    need = nn + b_si

    # --- level draws + upper-slot assignment (host; tiny) ---
    rng = np.random.default_rng(seed + int(nn.sum()))
    u = np.maximum(rng.random(b), 1e-300)
    lam = params.level_lambda
    lv_all = np.minimum((-np.log(u) * lam).astype(np.int64), LMAX).astype(np.int32)

    rows_np = np.zeros((s, bpad, width), np_dtype)
    sq_np = np.zeros((s, bpad), np.float32)
    lvl_blk = np.zeros((s, bpad), np.int32)
    slot_blk = np.full((s, bpad), -1, np.int32)
    lab_blk = np.zeros((s, bpad, 2), np.uint32)
    gid_blk = np.full((s, bpad), -1, np.int32)
    dele_blk = np.ones((s, bpad), bool)  # lanes beyond b_si stay tombstoned
    add_si = np.zeros(s, np.int64)
    with_rerank = quant_mode == "pq" and index.rerank_rows is not None
    if with_rerank:
        true_blk = np.zeros((s, bpad, width), np.float32)
        true_sq_blk = np.zeros((s, bpad), np.float32)
    for si in range(s):
        mine = owner == si
        k = int(b_si[si])
        if k == 0:
            continue
        rows_np[si, :k] = vectors[mine]
        if metric != Metric.HAMMING:
            vf = rows_np[si, :k].astype(np.float32)
            sq_np[si, :k] = np.einsum("nd,nd->n", vf, vf)
        if with_rerank:
            true_blk[si, :k] = true_rows[mine]
            true_sq_blk[si, :k] = np.einsum(
                "nd,nd->n", true_blk[si, :k], true_blk[si, :k]
            )
        lvs = lv_all[mine]
        lvl_blk[si, :k] = lvs
        has = lvs >= 1
        add_si[si] = int(has.sum())
        slot_blk[si, :k][has] = nup[si] + np.arange(add_si[si], dtype=np.int32)
        lab_blk[si, :k] = _split(labels[mine])
        gid_blk[si, :k] = new_gids[mine]
        dele_blk[si, :k] = False

    # --- capacity / upper-capacity growth (amortized doubling) ---
    new_cap = cap
    while new_cap < int(need.max()) or new_cap < int(nn.max()) + bpad:
        new_cap = max(8, new_cap * 2)
    ucap_old = g.upper_neighbors.shape[1]
    ucap_new = max(ucap_old, int((nup + add_si).max()) + 1)  # +1 dummy space

    # --- metadata fetch for the per-level candidate pools ---
    levels_host = np.asarray(jax.device_get(g.levels))  # [S, cap] i32
    lvl_full = np.zeros((s, new_cap), np.int32)
    lvl_full[:, :cap] = levels_host
    for si in range(s):
        lvl_full[si, nn[si]: nn[si] + bpad] = lvl_blk[si]
        lvl_full[si, need[si]:] = 0  # pad lanes past the live set
    UPPER_POOL_CAP = 32768
    global_max_lvl = int(lvl_full[:, : int(need.max())].max()) if need.max() else 0
    level_arrays = []
    for lvl in range(1, global_max_lvl + 1):
        per_shard = []
        for si in range(s):
            lids = np.nonzero(lvl_full[si, : need[si]] >= lvl)[0].astype(np.int32)
            if len(lids) > UPPER_POOL_CAP:
                lids = np.sort(rng.choice(lids, UPPER_POOL_CAP, replace=False))
            per_shard.append(lids)
        size = max(8, 1 << int(np.ceil(np.log2(max(max(len(x) for x in per_shard), 1)))))
        arr = np.full((s, size), -1, np.int32)
        for si in range(s):
            arr[si, : len(per_shard[si])] = per_shard[si]
        level_arrays.append(arr)

    def put(x, spec=P("shard")):
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    level_tuple_dev = tuple(put(a) for a in level_arrays)

    # --- device-side grow + scatter (shard_map; zero collectives) ---
    from jax import shard_map

    n0_dev = put(nn.astype(np.int32))
    nup_dev = put(nup.astype(np.int32))
    store_dtype = g.vectors.dtype

    def grow_scatter(vec, sqn, nbr0, up, uslot, lvl, lab, dele, gid,
                     n0, nupper, nrows, nsq, nlvl, nslot, nlab, ndele, ngid):
        # per-device blocks, leading dim 1
        n0 = n0[0]
        nupper = nupper[0]

        def pad_rows(a, rows, fill):
            extra = rows - a.shape[1]
            if extra <= 0:
                return a
            blk = jnp.full((1, extra) + a.shape[2:], fill, a.dtype)
            return jnp.concatenate([a, blk], axis=1)

        def upd(a, blk):
            idx = (jnp.int32(0), n0) + (jnp.int32(0),) * (a.ndim - 2)
            return jax.lax.dynamic_update_slice(a, blk, idx)

        vec2 = upd(pad_rows(vec, new_cap, 0), nrows.astype(vec.dtype))
        sq2 = upd(pad_rows(sqn, new_cap, 0), nsq)
        # drop the old dummy row at index cap (absorbs conflict scatters —
        # may hold garbage) and append fresh -1 rows + a new dummy
        nbr2 = jnp.concatenate(
            [nbr0[:, :cap],
             jnp.full((1, new_cap + 1 - cap, 2 * m), -1, jnp.int32)], axis=1
        )
        # upper adjacency: keep only this shard's REAL slots (rows past
        # nupper are blanks or the build's dummy-scatter garbage), then
        # grow to ucap_new
        uidx = jnp.arange(up.shape[1], dtype=jnp.int32)
        up_clean = jnp.where(
            (uidx < nupper)[None, :, None, None], up, -1
        )
        up2 = pad_rows(up_clean, ucap_new, -1)
        uslot2 = upd(pad_rows(uslot, new_cap, -1), nslot)
        lvl2 = upd(pad_rows(lvl, new_cap, 0), nlvl)
        lab2 = upd(pad_rows(lab, new_cap, 0), nlab)
        dele2 = upd(pad_rows(dele, new_cap, True), ndele)
        gid2 = jnp.concatenate(
            [gid[:, :cap],
             jnp.full((1, new_cap + 1 - cap), -1, jnp.int32)], axis=1
        )
        gid2 = upd(gid2, ngid)
        return vec2, sq2, nbr2, up2, uslot2, lvl2, lab2, dele2, gid2

    spec = P("shard")
    # quantized storage: materialize the f32 view of the stored geometry
    # per shard (decoded centroids / dequantized codes) for the rounds
    vec_in = g.vectors
    if quant_mode == "pq":
        cbj = jnp.asarray(codebook.centroids)  # [S_sub, K, dsub]
        s_sub = codebook.centroids.shape[0]

        def dec_block(codes):
            c = codes[0].astype(jnp.int32)
            d = cbj[jnp.arange(s_sub)[None, :], c]  # [cap, S_sub, dsub]
            return d.reshape(c.shape[0], width).astype(jnp.float32)[None]

        vec_in = jax.jit(shard_map(
            dec_block, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        ))(g.vectors)
    elif quant_mode == "i8":
        def deq_block(codes, scales):
            return (codes[0].astype(jnp.float32) * scales[0][:, None])[None]

        vec_in = jax.jit(shard_map(
            deq_block, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
            check_vma=False,
        ))(g.vectors, g.vec_scales)

    grow = jax.jit(shard_map(
        grow_scatter, mesh=mesh,
        in_specs=(spec,) * 18, out_specs=(spec,) * 9,
        check_vma=False,
    ))
    vec2, sq2, nbr2, up2, uslot2, lvl2, lab2, dele2, gid2 = grow(
        vec_in, g.sq_norms, g.neighbors0, g.upper_neighbors,
        g.upper_slot, g.levels, g.labels, g.deleted, index.global_ids,
        n0_dev, nup_dev,
        put(rows_np), put(sq_np), put(lvl_blk), put(slot_blk),
        put(lab_blk), put(dele_blk), put(gid_blk),
    )

    # --- the insert rounds (same SPMD program as the parallel build) ---
    st = BuildState(
        vectors=vec2, sq_norms=sq2, neighbors0=nbr2, upper_neighbors=up2,
        upper_slot=uslot2, levels=lvl2, entry=g.entry,
        max_level=g.max_level, n=g.num_nodes,
        m=m, dim=width, metric=int(metric),
    )
    st_spec = jax.tree_util.tree_map(lambda _: P("shard"), st)
    lvl_spec = tuple(P("shard") for _ in level_tuple_dev)
    built_min = int(nn.min())
    flat_cand = (candidates == "flat"
                 or (candidates == "hybrid" and built_min < flat_until))
    rounds_fn = _sharded_rounds_fn(
        mesh, st_spec, lvl_spec, efc=params.ef_construction,
        max_in=max_in, flat_cand=flat_cand,
    )
    rounds = []
    pos = 0
    while pos < bpad:
        size = min(batch, bpad - pos)
        ids = np.full((s, size), -1, np.int32)
        for si in range(s):
            hi = min(pos + size, int(b_si[si]))
            if hi > pos:
                ids[si, : hi - pos] = nn[si] + np.arange(pos, hi, dtype=np.int32)
        rounds.append(ids)
        pos += size
    from lantern_tpu.graph.build_device import ROUND_GROUP

    def put_ids(ids3d):
        return jax.device_put(
            jnp.asarray(ids3d), NamedSharding(mesh, P(None, "shard"))
        )

    i = 0
    while i < len(rounds):
        grp = [r for r in rounds[i: i + ROUND_GROUP]
               if r.shape[1] == rounds[i].shape[1]]
        st = rounds_fn(st, put_ids(np.stack(grp)), level_tuple_dev)
        i += len(grp)

    # --- restore quantized storage (exact for existing rows) ---
    out_vecs = st.vectors
    out_scales = None
    new_rerank = index.rerank_rows
    new_rsqn = index.rerank_sqn
    if quant_mode == "pq":
        from lantern_tpu.quant.pq import _encode_jit

        def enc_block(v):
            # rows already live in the rotated space — no rotation here
            return _encode_jit(v[0], cbj, None)[None]

        out_vecs = jax.jit(shard_map(
            enc_block, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        ))(st.vectors)
        if with_rerank:
            def rr_block(rows, sqn, tr, tsq, n0):
                n0v = n0[0]

                def pad_rows(a, rows_n, fill):
                    extra = rows_n - a.shape[1]
                    if extra <= 0:
                        return a
                    return jnp.concatenate(
                        [a, jnp.full((1, extra) + a.shape[2:], fill, a.dtype)],
                        axis=1,
                    )

                r2 = jax.lax.dynamic_update_slice(
                    pad_rows(rows, new_cap, 0), tr.astype(rows.dtype),
                    (jnp.int32(0), n0v, jnp.int32(0)),
                )
                s2 = jax.lax.dynamic_update_slice(
                    pad_rows(sqn, new_cap, 0), tsq, (jnp.int32(0), n0v)
                )
                return r2, s2

            new_rerank, new_rsqn = jax.jit(shard_map(
                rr_block, mesh=mesh, in_specs=(spec,) * 5,
                out_specs=(spec, spec), check_vma=False,
            ))(index.rerank_rows, index.rerank_sqn,
               put(true_blk), put(true_sq_blk), n0_dev)
    elif quant_mode == "i8":
        from lantern_tpu.quant.scalar import quantize_i8

        def q_block(v):
            c, sc = quantize_i8(v[0])
            return c[None], sc[None]

        out_vecs, out_scales = jax.jit(shard_map(
            q_block, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec),
            check_vma=False,
        ))(st.vectors)

    # --- final stacked graph (upper_ids extended host-side; tiny) ---
    old_uids = np.asarray(jax.device_get(g.upper_ids))
    uid_np = np.full((s, ucap_new), -1, np.int32)
    for si in range(s):
        uid_np[si, : nup[si]] = old_uids[si, : nup[si]]
        has = slot_blk[si] >= 0
        uid_np[si][slot_blk[si][has]] = nn[si] + np.nonzero(has)[0].astype(np.int32)
    graphs = DeviceGraph(
        vectors=out_vecs,
        sq_norms=st.sq_norms,
        neighbors0=st.neighbors0,
        upper_neighbors=st.upper_neighbors,
        upper_slot=st.upper_slot,
        levels=st.levels,
        labels=lab2,
        deleted=dele2,
        entry=st.entry,
        max_level=st.max_level,
        num_nodes=put(need.astype(np.int32)),
        upper_ids=put(uid_np),
        vec_scales=out_scales,
        pq_codebook=g.pq_codebook,
        pq_rotation=g.pq_rotation,
        m=m,
        dim=g.dim,
        metric=int(metric),
        quant=g.quant,
    )
    return ShardedIndex(graphs=graphs, global_ids=gid2,
                        rerank_rows=new_rerank, rerank_sqn=new_rsqn,
                        params=params)


def delete_sharded(index: ShardedIndex, labels: np.ndarray) -> ShardedIndex:
    """Tombstone by label across all shards (delete.c semantics).

    Labels are resolved HOST-SIDE by sorted binary search per shard —
    O((cap + L) log cap) time and O(S x cap) memory. (The previous
    device-side broadcast compare materialized an [S, cap, L, 2]
    intermediate: a 100k-label bulk delete against 8 x 1.25M-row shards is
    a ~10^11-element array — OOM. The label fetch here is S*cap*8 bytes,
    ~10 MB at that scale.) Duplicate labels tombstone every matching row,
    same as the broadcast compare did.
    """
    from lantern_tpu.graph.device import join_labels

    dead = np.unique(np.asarray(labels, np.uint64).reshape(-1))
    lab = join_labels(np.asarray(jax.device_get(index.graphs.labels)))
    old = np.asarray(jax.device_get(index.graphs.deleted), bool)
    hit = np.zeros_like(old)
    s = lab.shape[0]
    for si in range(s):
        order = np.argsort(lab[si], kind="stable")
        slab = lab[si][order]
        lo = np.searchsorted(slab, dead, side="left")
        hi = np.searchsorted(slab, dead, side="right")
        counts = hi - lo
        if counts.sum() == 0:
            continue
        starts = np.repeat(lo, counts)
        offs = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        hit[si][order[starts + offs]] = True
    new_deleted = jax.device_put(
        np.logical_or(old, hit), index.graphs.deleted.sharding
    )
    return index.replace(graphs=index.graphs.replace(deleted=new_deleted))


def compact_sharded(
    index: ShardedIndex,
    mesh: Mesh,
    params: HnswParams | None = None,
    batch: int = 256,
    seed: int = 0,
    **kw,
) -> ShardedIndex:
    """Rebuild the sharded index without its tombstoned nodes — the
    multi-chip analog of Index.compact(). Labels are preserved; internal
    global ids are reassigned (rebalanced round-robin over the live set),
    so callers holding gids should re-resolve via labels.

    ``params`` optionally re-parametrizes the graph (dim/metric must match
    — vectors are reused as stored). Runs a full parallel device rebuild
    (build_sharded_device) over the live rows.
    """
    from lantern_tpu.graph.device import join_labels

    p = index.params if params is None else params
    if index.params is not None:
        for field in ("dim", "metric"):
            if getattr(p, field) != getattr(index.params, field):
                raise ValueError(f"compact_sharded cannot change {field}")
    s = index.global_ids.shape[0]
    quant_kind = None
    from lantern_tpu.config import QuantKind
    from lantern_tpu.graph.device import QUANT_PQ

    if index.graphs.quant == QUANT_PQ:
        quant_kind = "pq"
    elif index.graphs.quant == int(QuantKind.I8):
        quant_kind = "i8"
    live_vecs, live_labels = [], []
    for si in range(s):
        # _ShardView resolves quantized storage to source rows (rerank copy /
        # decoded / dequantized) so the rebuild inserts real vectors
        view = _ShardView(index, si)
        n = view.n
        alive = ~np.asarray(view.deleted[:n], bool)
        v = np.asarray(view.vectors[:n])
        if v.dtype.name == "bfloat16":
            v = v.astype(np.float32)  # exact widening; store="bf16" re-casts
        live_vecs.append(v[alive])
        live_labels.append(view.labels[:n][alive])
    vecs = np.concatenate(live_vecs)
    labels = np.concatenate(live_labels).astype(np.uint64)
    base_p = p
    if quant_kind == "pq":
        base_p = dataclasses.replace(p, pq=False)
    elif quant_kind == "i8":
        base_p = dataclasses.replace(p, quant=QuantKind.F32)
    out = build_sharded_device(
        vecs, base_p, mesh, batch=batch, seed=seed, labels=labels, **kw
    )
    if quant_kind is not None:
        out = quantize_sharded(
            out, mesh, quant=quant_kind,
            codebook=_sharded_codebook(index),
            keep_rerank=index.rerank_rows is not None,
        )
    return out


@dataclasses.dataclass
class ShardedSearchStats:
    """Static description of the sharded program (for planning/costing)."""

    n_shards: int
    shard_cap: int
    collective_bytes_per_batch: int

    @classmethod
    def of(cls, index: ShardedIndex, q: int, k: int) -> "ShardedSearchStats":
        s = index.global_ids.shape[0]
        return cls(
            n_shards=s,
            shard_cap=index.global_ids.shape[1] - 1,
            # [S, Q, k] f32+i32+2xu32 gathered to every device
            collective_bytes_per_batch=s * q * k * 16,
        )

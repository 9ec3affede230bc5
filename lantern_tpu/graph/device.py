"""Device-resident graph arrays — the HBM-resident padded CSR.

Replaces the reference's on-page node tape (8-byte label + 2-byte level +
per-level padded neighbor-slot lists + vector bytes packed into 8 KB Postgres
pages — usearch_storage.cpp:19-32, validate_index.c:122-226) with flat,
statically-shaped device arrays:

- ``vectors[cap, dim]``        storage dtype (f32 / bf16 / i8 / packed u32)
- ``neighbors0[cap+1, 2M]``    level-0 adjacency, -1 padded; row `cap` is the
                               all-invalid dummy row so clipped gathers of
                               invalid ids read garbage-free padding
- ``upper_neighbors[ucap, LMAX, M]`` adjacency for the ~N/M nodes with level≥1
- ``upper_slot[cap]``          node id -> upper slot (-1 for level-0 nodes)
- ``labels[cap]``, ``deleted[cap]``   external keys + tombstones (delete.c)
- ``entry / max_level / num_nodes``   scalars (the reference keeps these in the
                               136-byte usearch header on page 0)

seqid IS the array index — the reference's two-pass seqid→TID neighbor
rewrite (external_index.c:373-418) is unnecessary by construction.
"""

from __future__ import annotations

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from lantern_tpu.config import Metric, QuantKind

# DeviceGraph.quant sentinel for product quantization (the reference keeps a
# separate `pq` reloption from scalar quant_bits; same separation here)
QUANT_PQ = 100


@struct.dataclass
class DeviceGraph:
    vectors: jax.Array          # [cap, width] storage dtype
    sq_norms: jax.Array         # [cap] f32 (zeros for hamming)
    neighbors0: jax.Array       # [cap+1, m0] int32
    upper_neighbors: jax.Array  # [ucap, LMAX, m] int32
    upper_slot: jax.Array       # [cap] int32
    levels: jax.Array           # [cap] int32
    labels: jax.Array           # [cap, 2] uint32 (lo, hi) — u64 split because
                                # device x64 is off by default in JAX
    deleted: jax.Array          # [cap] bool
    entry: jax.Array            # [] int32
    max_level: jax.Array        # [] int32
    num_nodes: jax.Array        # [] int32
    # quantization payloads (None when unused)
    vec_scales: jax.Array | None = None   # [cap] f32 per-vector i8 scales
    pq_codebook: jax.Array | None = None  # [S, K, dsub] f32
    # OPQ rotation [dim, dim] (codes/centroids live in the rotated space;
    # searches rotate the query once — see quant/pq.PQCodebook)
    pq_rotation: jax.Array | None = None
    # upper_ids[slot] = node id (-1 for the dummy/blank slots): the inverse
    # of upper_slot, kept so search can score ALL upper-level nodes with one
    # dense MXU scan instead of a serialized greedy descent (profiled 101 ms
    # of a 260 ms batch at 1M). None -> search falls back to greedy descent.
    upper_ids: jax.Array | None = None    # [ucap] int32
    # norm-folded row table [cap+1, dim+4] bf16: row = [x, hi(x2), lo(x2),
    # 0, 0] with hi/lo a double-bf16 split of sq_norm (relative error
    # ~2^-16, f32-class). The beam search's per-candidate x2 was a SCALAR
    # element gather — profiled r5 at 467 us/iter (fusion.88), 30% of a 1M
    # ef64 batch — while TPU row gathers are latency- not byte-bound
    # (gather_rate_result.json: f32 512 B rows cost the same ns/row as bf16
    # 256 B), so folding x2 INTO the gathered row makes it free: one einsum
    # against query [q, -0.5, -0.5, 0, 0] yields q.x - x2/2 directly.
    # Derived data: ONLY attached by with_aug_norms(); every insert path
    # constructs a fresh DeviceGraph (field defaults to None), so a stale
    # table cannot survive a mutation. Search falls back when None.
    vectors_aug: jax.Array | None = None  # [cap, dim+AUG_COLS] bf16
    # cached upper-subset tables for the entry scan: vectors[max(upper_ids,
    # 0)] / sq_norms[...] are otherwise re-gathered EVERY batch (~1.1
    # ms/batch at 1M, fusions 73/74 in the r5 trace). Derived data with the
    # same lifecycle as vectors_aug: attached only by with_aug_norms, never
    # survives an insert (fresh DeviceGraph construction drops it).
    upper_vectors: jax.Array | None = None  # [ucap, width] storage dtype
    upper_sq: jax.Array | None = None       # [ucap] f32
    # static (hashable) metadata — changing these retriggers jit
    m: int = struct.field(pytree_node=False, default=16)
    dim: int = struct.field(pytree_node=False, default=0)
    metric: int = struct.field(pytree_node=False, default=int(Metric.L2SQ))
    quant: int = struct.field(pytree_node=False, default=0)  # QuantKind / QUANT_PQ
    # route candidate distances through the fused Pallas gather kernel
    # (ops/pallas_gather.py). Measured in-loop on v5e: LOSES to XLA's own
    # row gather (kept as an opt-in reference kernel; don't enable without
    # fresh profile evidence)
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @property
    def cap(self) -> int:
        return self.vectors.shape[0]

    @property
    def m0(self) -> int:
        return self.neighbors0.shape[1]


# extra columns appended by the norm-fold: [hi, lo, 0, 0]. Any width in
# (dim, dim + 128] tiles to the same padded lane count on TPU, so 4 vs 2
# costs nothing and leaves room for future per-row payloads.
AUG_COLS = 4


def aug_norms_table(vectors: jax.Array, sq_norms: jax.Array) -> jax.Array:
    """[cap, dim+AUG_COLS] bf16 rows [x, hi(x2), lo(x2), 0, 0] (see
    DeviceGraph.vectors_aug). hi/lo double-bf16: hi = bf16(x2),
    lo = bf16(x2 - f32(hi)); products with the -0.5 query columns are exact
    (powers of two), so the folded einsum reproduces q.x - x2/2 to ~2^-16
    relative — the same error class as the bf16 dot itself."""
    v = vectors.astype(jnp.bfloat16)
    hi = sq_norms.astype(jnp.bfloat16)
    lo = (sq_norms - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    pad = jnp.zeros((v.shape[0], AUG_COLS - 2), jnp.bfloat16)
    return jnp.concatenate([v, hi[:, None], lo[:, None], pad], axis=1)


def aug_queries(queries_f32: jax.Array) -> jax.Array:
    """Query-side fold companion: [q, -0.5, -0.5, 0, 0] (f32)."""
    q = queries_f32.shape[0]
    half = jnp.full((q, 2), -0.5, jnp.float32)
    pad = jnp.zeros((q, AUG_COLS - 2), jnp.float32)
    return jnp.concatenate([queries_f32.astype(jnp.float32), half, pad], axis=1)


def with_aug_norms(g: DeviceGraph) -> DeviceGraph:
    """Attach the norm-folded row table when the graph qualifies (l2sq over
    f32/bf16 storage), plus the cached upper-subset entry-scan tables.
    No-op otherwise; idempotent. Call at device-mirror build time — NOT
    inside jit."""
    from lantern_tpu.config import QuantKind

    if g.vectors_aug is not None:
        return g
    if Metric(g.metric) != Metric.L2SQ or g.vec_scales is not None:
        return g
    if g.quant not in (int(QuantKind.F32), int(QuantKind.F16)):
        return g
    upper_vectors = upper_sq = None
    if g.upper_ids is not None and g.upper_ids.shape[0] > 1:
        @jax.jit
        def _upper_tabs(vectors, sq_norms, uids):
            safe = jnp.maximum(uids, 0)
            return vectors[safe], sq_norms[safe]

        upper_vectors, upper_sq = _upper_tabs(g.vectors, g.sq_norms,
                                              g.upper_ids)
    return g.replace(
        vectors_aug=jax.jit(aug_norms_table)(g.vectors, g.sq_norms),
        upper_vectors=upper_vectors,
        upper_sq=upper_sq,
    )


def upper_ids_from_slots(upper_slot: np.ndarray, ucap: int) -> np.ndarray:
    """Invert a node->slot map to slot->node ids ([ucap] int32, -1 blanks)."""
    slots = np.asarray(upper_slot, np.int32)
    ids = np.full(ucap, -1, np.int32)
    has = slots >= 0
    ids[slots[has]] = np.nonzero(has)[0].astype(np.int32)
    return ids


def _sq_norms_np(vectors: np.ndarray, metric: Metric) -> np.ndarray:
    if metric == Metric.HAMMING:
        return np.zeros(vectors.shape[0], np.float32)
    v = vectors.astype(np.float32)
    return np.einsum("nd,nd->n", v, v).astype(np.float32)


def split_labels(labels_u64: np.ndarray) -> np.ndarray:
    """u64 labels -> [n, 2] uint32 (lo, hi)."""
    lab = np.asarray(labels_u64, np.uint64)
    return np.stack(
        [(lab & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (lab >> np.uint64(32)).astype(np.uint32)],
        axis=1,
    )


def join_labels(pairs: np.ndarray) -> np.ndarray:
    """[n, 2] uint32 (lo, hi) -> u64 labels."""
    p = np.asarray(pairs, np.uint32)
    return p[..., 0].astype(np.uint64) | (p[..., 1].astype(np.uint64) << np.uint64(32))


def to_device(host, dtype=None, quant: QuantKind | int | None = None,
              pq_codebook=None) -> DeviceGraph:
    """Copy a HostHnsw/NativeHnsw into a DeviceGraph.

    - ``dtype``: cast float vector storage (e.g. jnp.bfloat16 / jnp.float16).
    - ``quant=QuantKind.I8``: store int8 codes + per-vector scales (host
      vectors are assumed already dequantized i8 values, so re-encoding is
      exact).
    - ``pq_codebook`` (PQCodebook): store uint8 PQ codes only — the HBM
      footprint drops from n*dim*4 to n*S bytes; distances run through ADC
      LUTs in the search kernel.
    """
    import jax

    metric = Metric(host.metric)
    n = host.n
    if jax.default_backend() == "cpu" and hasattr(host, "_h"):
        # NativeHnsw exports are zero-copy views into C++-owned memory; on
        # the CPU backend jnp.asarray can ALIAS host numpy buffers, so the
        # DeviceGraph would dangle after engine grow()/free. Copy up front
        # (TPU backends copy to HBM anyway).
        def cp(a):
            return np.array(a, copy=True)
    else:
        def cp(a):
            return a
    vectors = cp(host.vectors[:n])
    sqn = _sq_norms_np(vectors, metric)
    vec_scales = None
    pq_cb = None
    pq_rot = None
    eff_quant = int(quant) if quant is not None else int(QuantKind.F32)
    if pq_codebook is not None:
        from lantern_tpu.quant.pq import pq_encode

        eff_quant = QUANT_PQ
        codes = pq_encode(vectors, pq_codebook)  # [n, S] uint8
        vec_dev = jnp.asarray(codes)
        pq_cb = jnp.asarray(pq_codebook.centroids)
        if pq_codebook.rotation is not None:
            pq_rot = jnp.asarray(pq_codebook.rotation, jnp.float32)
    elif eff_quant == int(QuantKind.I8):
        from lantern_tpu.quant.scalar import quantize_i8

        codes, scales = quantize_i8(jnp.asarray(vectors))
        vec_dev = codes
        vec_scales = scales
    else:
        vec_dev = jnp.asarray(vectors)
        if dtype is not None and metric != Metric.HAMMING:
            vec_dev = vec_dev.astype(dtype)
            eff_quant = int(QuantKind.F16) if dtype in (jnp.float16, jnp.bfloat16) else eff_quant
    nbr0 = np.concatenate(
        [host.neighbors0[:n], np.full((1, host.p.m0), -1, np.int32)], axis=0
    )
    return DeviceGraph(
        vectors=vec_dev,
        sq_norms=jnp.asarray(sqn),
        neighbors0=jnp.asarray(nbr0),
        upper_neighbors=jnp.asarray(
            cp(host.upper_neighbors[: max(host.n_upper, 1)])
        ),
        upper_slot=jnp.asarray(cp(host.upper_slot[:n])),
        levels=jnp.asarray(cp(host.levels[:n])),
        labels=jnp.asarray(split_labels(host.labels[:n])),
        deleted=jnp.asarray(host.deleted[:n]),
        entry=jnp.asarray(host.entry, jnp.int32),
        max_level=jnp.asarray(host.max_level, jnp.int32),
        num_nodes=jnp.asarray(n, jnp.int32),
        vec_scales=vec_scales,
        pq_codebook=pq_cb,
        pq_rotation=pq_rot,
        upper_ids=jnp.asarray(
            upper_ids_from_slots(host.upper_slot[:n], max(host.n_upper, 1))
        ),
        m=host.p.m,
        dim=host.p.dim,
        metric=int(metric),
        quant=eff_quant,
    )

"""Device (TPU-native) batched builder tests — small sizes on the CPU mesh.

The builder must produce graphs with recall parity to the sequential host
engine at equal parameters (the reference's quality bar for its external
indexing server: same usearch graph, built concurrently).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.graph.build_device import build_on_device
from lantern_tpu.graph.device import join_labels
from lantern_tpu.graph.search import search_batched
from lantern_tpu.graph.validate import validate_device
from lantern_tpu.ops import exact_search


def _recall(found_ids, true_ids):
    hits = 0
    for f, t in zip(found_ids, true_ids):
        hits += len(set(int(x) for x in f if x >= 0) & set(int(x) for x in t))
    return hits / true_ids.size


# Shared shape family: XLA:CPU compiles one scanned insert-round program
# per DISTINCT (n, dim, m, efc, batch, metric, store) tuple, and compiles
# dominate this file's wall time (428 s measured r4, ~all of it compile).
# Tests reuse the module fixture's graph/shape wherever semantics allow.
FIX_N, FIX_DIM, FIX_EFC, FIX_BATCH = 2000, 16, 48, 128


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(60)
    base = rng.standard_normal((FIX_N, FIX_DIM)).astype(np.float32)
    p = HnswParams(dim=FIX_DIM, m=8, ef_construction=FIX_EFC)
    g = build_on_device(base, p, batch=FIX_BATCH, seed=0)
    return g, base, p


def test_device_build_recall_parity(built):
    g, base, p = built
    rng = np.random.default_rng(61)
    q = rng.standard_normal((32, FIX_DIM)).astype(np.float32)
    _, tids = exact_search(jnp.array(q), jnp.array(base), k=10)
    _, ids, _ = search_batched(g, jnp.array(q), k=10, ef=64)
    rec_dev = _recall(np.asarray(ids), np.asarray(tids))
    # host engine at identical params
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.native import NativeHnsw

    ix = NativeHnsw(p, capacity=FIX_N, seed=0)
    ix.add(base)
    _, ids_h, _ = search_batched(to_device(ix), jnp.array(q), k=10, ef=64)
    rec_host = _recall(np.asarray(ids_h), np.asarray(tids))
    assert rec_dev >= rec_host - 0.05, f"device {rec_dev} vs host {rec_host}"
    assert rec_dev >= 0.85


def test_device_build_structure(built):
    g, base, p = built
    n = int(g.num_nodes)
    assert n == FIX_N
    nb = np.asarray(g.neighbors0[:n])
    rows = np.arange(n)[:, None]
    assert ((nb != rows) | (nb < 0)).all(), "self loops"
    assert nb.max() < n
    deg = (nb >= 0).sum(1)
    assert (deg <= p.m0).all() and deg.min() >= 1
    rep = validate_device(g, full=True)
    rep.raise_if_failed()


def test_device_build_labels(built):
    g, base, p = built
    rng = np.random.default_rng(62)
    # labels default to arange
    q = jnp.array(base[:4])
    d, ids, labels = search_batched(g, q, k=3, ef=32)
    joined = join_labels(np.asarray(labels))
    ids = np.asarray(ids)
    np.testing.assert_array_equal(joined[ids >= 0].astype(np.int64), ids[ids >= 0])
    assert (ids[:, 0] == np.arange(4)).all()  # self-match
    del rng


def test_device_build_cosine():
    rng = np.random.default_rng(63)
    base = rng.standard_normal((800, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48, metric=Metric.COS)
    g = build_on_device(base, p, batch=128, seed=0)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    _, tids = exact_search(jnp.array(q), jnp.array(base), k=10, metric=Metric.COS)
    _, ids, _ = search_batched(g, jnp.array(q), k=10, ef=64)
    assert _recall(np.asarray(ids), np.asarray(tids)) >= 0.85


def test_device_build_hamming():
    """Hamming device build over packed u32 words (options.c:137-158 /
    build.c:504-509 coverage: the full metric matrix builds on device)."""
    rng = np.random.default_rng(65)
    base = rng.integers(0, 2**32, size=(800, 2), dtype=np.uint32)
    p = HnswParams(dim=64, m=8, ef_construction=48, metric=Metric.HAMMING)
    g = build_on_device(base, p, batch=128, seed=0)
    assert int(g.num_nodes) == 800
    q = jnp.asarray(base[:8])
    d, ids, _ = search_batched(g, q, k=3, ef=32)
    assert (np.asarray(ids)[:, 0] == np.arange(8)).all()
    assert (np.asarray(d)[:, 0] == 0).all()
    _, tids = exact_search(q, jnp.asarray(base), k=10, metric=Metric.HAMMING)
    _, ids10, _ = search_batched(g, q, k=10, ef=64)
    assert _recall(np.asarray(ids10), np.asarray(tids)) >= 0.8
    validate_device(g, full=True).raise_if_failed()


def test_device_insert_quantized():
    """device_insert on bf16- and i8-stored graphs (fast-path hole closed:
    insert rounds run on an f32 view, storage re-quantized after)."""
    from lantern_tpu.config import QuantKind
    from lantern_tpu.graph.build_device import device_insert
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.native import NativeHnsw

    rng = np.random.default_rng(66)
    base = rng.standard_normal((900, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    eng = NativeHnsw(p, capacity=600, seed=0)
    eng.add(base[:600])
    for kwargs in ({"dtype": jnp.bfloat16}, {"quant": QuantKind.I8}):
        g = to_device(eng, **kwargs)
        g2 = device_insert(g, base[600:], batch=128, seed=1, ef_construction=48)
        assert int(g2.num_nodes) == 900
        assert g2.vectors.dtype == g.vectors.dtype  # storage kind restored
        if kwargs.get("quant") == QuantKind.I8:
            assert g2.vec_scales is not None
        q = jnp.asarray(base[600:608])
        _, ids, _ = search_batched(g2, q, k=1, ef=32)
        np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(600, 608))
        _, tids = exact_search(jnp.asarray(base[::91]), jnp.asarray(base), k=10)
        _, ids10, _ = search_batched(g2, jnp.asarray(base[::91]), k=10, ef=64)
        assert _recall(np.asarray(ids10), np.asarray(tids)) >= 0.8


def test_device_insert_hamming():
    from lantern_tpu.graph.build_device import device_insert

    rng = np.random.default_rng(67)
    base = rng.integers(0, 2**32, size=(500, 2), dtype=np.uint32)
    p = HnswParams(dim=64, m=8, ef_construction=32, metric=Metric.HAMMING)
    g = build_on_device(base[:300], p, batch=128, seed=0)
    g2 = device_insert(g, base[300:], batch=64, seed=1, ef_construction=32)
    assert int(g2.num_nodes) == 500
    d, ids, _ = search_batched(g2, jnp.asarray(base[300:306]), k=1, ef=16)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(300, 306))
    assert (np.asarray(d)[:, 0] == 0).all()


def test_device_build_tiny():
    rng = np.random.default_rng(64)
    base = rng.standard_normal((5, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    g = build_on_device(base, p, batch=256, seed=0)
    d, ids, _ = search_batched(g, jnp.array(base), k=5, ef=8)
    assert (np.asarray(ids)[:, 0] == np.arange(5)).all()


def test_device_build_bf16_store(built):
    """store="bf16" (the 10M-scale HBM mode): bf16 table end to end —
    recall parity with the f32 build, structure valid, donate accepted.
    The module fixture's graph is the f32 comparator (same data, params,
    and batch — one build and one program shape saved)."""
    import jax

    g32, base, p = built
    rng = np.random.default_rng(65)
    base_bf = jnp.asarray(base).astype(jnp.bfloat16)
    g16 = build_on_device(base_bf, p, batch=FIX_BATCH, seed=0, donate=True,
                          store="bf16")
    assert g16.vectors.dtype == jnp.bfloat16
    assert int(g16.num_nodes) == FIX_N
    q = rng.standard_normal((32, 16)).astype(np.float32)
    _, tids = exact_search(jnp.array(q), jnp.array(base), k=10)
    _, ids32, _ = search_batched(g32, jnp.array(q), k=10, ef=64)
    _, ids16, _ = search_batched(g16, jnp.array(q), k=10, ef=64)
    r32 = _recall(np.asarray(ids32), np.asarray(tids))
    r16 = _recall(np.asarray(ids16), np.asarray(tids))
    assert r16 >= r32 - 0.03, f"bf16 store {r16} vs f32 {r32}"
    rep = validate_device(g16, full=True)
    rep.raise_if_failed()
    del jax


def test_device_build_hybrid_candidates(built):
    """candidates="hybrid": flat pools below flat_until, beam above — the
    10M-scale schedule (flat is O(prefix)/round; beam is size-independent).
    Both phases must execute and the graph must stay near flat quality.
    The module fixture's flat-built graph is the comparator."""
    g_flat, base, p = built
    rng = np.random.default_rng(66)
    g_hy = build_on_device(base, p, batch=FIX_BATCH, seed=0,
                           candidates="hybrid", flat_until=800)
    assert int(g_hy.num_nodes) == FIX_N
    rep = validate_device(g_hy, full=True)
    rep.raise_if_failed()
    q = rng.standard_normal((32, FIX_DIM)).astype(np.float32)
    _, tids = exact_search(jnp.array(q), jnp.array(base), k=10)
    _, ids_f, _ = search_batched(g_flat, jnp.array(q), k=10, ef=64)
    _, ids_h, _ = search_batched(g_hy, jnp.array(q), k=10, ef=64)
    rf = _recall(np.asarray(ids_f), np.asarray(tids))
    rh = _recall(np.asarray(ids_h), np.asarray(tids))
    assert rh >= rf - 0.08, f"hybrid {rh} vs flat {rf}"
    assert rh >= 0.8


def test_device_insert_hybrid_routes_to_beam():
    """device_insert(candidates="hybrid") with a tiny flat_until must take
    the beam path for every round and still link correctly."""
    from lantern_tpu.graph.build_device import device_insert

    rng = np.random.default_rng(67)
    base = rng.standard_normal((800, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    g = build_on_device(base, p, batch=128, seed=0)
    extra = rng.standard_normal((300, 16)).astype(np.float32)
    g2 = device_insert(g, extra, batch=128, seed=1,
                       candidates="hybrid", flat_until=1)
    assert int(g2.num_nodes) == 1100
    allv = np.concatenate([base, extra])
    q = rng.standard_normal((24, 16)).astype(np.float32)
    _, tids = exact_search(jnp.array(q), jnp.array(allv), k=10)
    _, ids, _ = search_batched(g2, jnp.array(q), k=10, ef=64)
    rec = _recall(np.asarray(ids), np.asarray(tids))
    assert rec >= 0.8, f"hybrid-insert recall {rec}"


def test_device_insert_incremental():
    """ldb_aminsert analog: incremental inserts with capacity growth."""
    from lantern_tpu.graph.build_device import device_insert

    rng = np.random.default_rng(70)
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    g = build_on_device(base[:800], p, batch=128, seed=0)
    g2 = device_insert(g, base[800:], batch=128, seed=1, ef_construction=48)
    assert int(g2.num_nodes) == 1200
    assert g2.cap >= 1200
    q = jnp.array(base[::97])
    _, tids = exact_search(q, jnp.array(base), k=10)
    _, ids, _ = search_batched(g2, q, k=10, ef=64)
    rec = _recall(np.asarray(ids), np.asarray(tids))
    assert rec >= 0.85, f"incremental recall {rec}"
    # newly inserted nodes findable by their own vectors
    _, ids2, _ = search_batched(g2, jnp.array(base[800:808]), k=1, ef=32)
    np.testing.assert_array_equal(np.asarray(ids2)[:, 0], np.arange(800, 808))
    rep = validate_device(g2, full=True)
    rep.raise_if_failed()


def test_reorder_bfs_identical_results():
    """BFS relabeling must return identical results modulo labels."""
    from lantern_tpu.graph.device import join_labels
    from lantern_tpu.graph.reorder import reorder_bfs

    rng = np.random.default_rng(71)
    # (800, 16, efc 48, batch 128): the shape family shared with the
    # insert/hybrid tests — one compiled build program serves all three
    base = rng.standard_normal((800, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    g = build_on_device(base, p, batch=128, seed=0)
    g2 = reorder_bfs(g)
    rep = validate_device(g2, full=True)
    rep.raise_if_failed()
    q = jnp.array(base[:24])
    d1, i1, _ = search_batched(g, q, k=10, ef=48)
    d2, _, lab2 = search_batched(g2, q, k=10, ef=48)
    back = join_labels(np.asarray(lab2)).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(i1), back)  # identical results
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_build_progress_callback():
    rng = np.random.default_rng(72)
    base = rng.standard_normal((300, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    fracs = []
    build_on_device(base, p, batch=64, seed=0, progress_cb=fracs.append)
    assert fracs and abs(fracs[-1] - 1.0) < 1e-9
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))


def test_index_device_bulk_build(rng, tmp_path):
    """Index.add(build='device'): TPU bulk build imported into the native
    engine — search parity with the device graph, snapshot round trip, and
    host inserts keep working afterwards."""
    import jax.numpy as jnp

    from lantern_tpu.index import Index

    base = rng.standard_normal((1200, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = Index(p, capacity=16)  # undersized: _grow must kick in
    ix.add(base, build="device", batch=128)
    assert ix.size == 1200
    d, labels = ix.search(base[:8], k=5, mode="graph", ef=48)
    assert (labels[:, 0] == np.arange(8)).all()
    # the engine's own (CPU) search agrees on the imported graph
    ids_cpu, _ = ix._eng.search(base[0], k=5, ef=48)
    assert ids_cpu[0] == 0
    # snapshot round trip preserves the imported graph
    path = str(tmp_path / "dev.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    d2, labels2 = ix2.search(base[:8], k=5, mode="graph", ef=48)
    np.testing.assert_array_equal(labels, labels2)
    # incremental host inserts still work after a device bulk load
    extra = rng.standard_normal((4, 16)).astype(np.float32)
    ix.add(extra)
    d3, labels3 = ix.search(extra, k=1, mode="graph", ef=48)
    assert (labels3[:, 0] == 1200 + np.arange(4)).all()
    # device-speed incremental ingest through the facade (VERDICT r3 #9):
    # a non-empty index routes build='device' through device_insert and
    # re-imports — new rows searchable on device AND host, old rows intact
    extra2 = rng.standard_normal((300, 16)).astype(np.float32)
    ix.add(extra2, build="device", batch=128)
    assert ix.size == 1504
    d4, labels4 = ix.search(extra2[:8], k=1, mode="graph", ef=48)
    assert (labels4[:, 0] == 1204 + np.arange(8)).all()
    ids_cpu2, _ = ix._eng.search(extra2[0], k=3, ef=48)
    assert ids_cpu2[0] == 1204
    d5, labels5 = ix.search(base[:8], k=5, mode="graph", ef=48)
    assert (labels5[:, 0] == np.arange(8)).all()
    rep = ix.validate()
    rep.raise_if_failed()
    # builder kwargs forward through the facade (hybrid pool schedule)
    ix3 = Index(p)
    ix3.add(base[:800], build="device", batch=128,
            candidates="hybrid", flat_until=300)
    _, lab3 = ix3.search(base[:8], k=5, mode="graph", ef=48)
    assert (lab3[:, 0] == np.arange(8)).all()


def test_compact_device_build():
    """compact(build='device') rebuilds the live set with the TPU builder."""
    from lantern_tpu.index import Index

    rng = np.random.default_rng(77)
    base = rng.standard_normal((900, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = Index(p, capacity=900)
    ix.add(base, build="device", batch=128)
    ix.delete(np.arange(0, 450, dtype=np.uint64))
    ix.compact(build="device", batch=128)
    assert ix.size == 450 and ix.num_deleted == 0
    ix.validate().raise_if_failed()
    _, labels = ix.search(base[500], k=5, mode="graph", ef=64)
    assert labels[0, 0] == 500
    assert (labels >= 450).all() | (labels == 0).any()


def test_device_insert_pq_graph():
    """device_insert into a PQ-coded graph (decode -> insert rounds ->
    re-encode; closes the last quant-matrix hole — the geometry is the
    decoded centroids, so the round trip is exact)."""
    from lantern_tpu.graph.device import QUANT_PQ, to_device
    from lantern_tpu.index import Index
    from lantern_tpu.quant.pq import pq_decode

    rng = np.random.default_rng(91)
    base = rng.standard_normal((600, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=48, pq=True,
                   num_subvectors=8, num_centroids=64)
    ix = Index(p, capacity=600)
    ix.train_pq(base)
    ix.add(base)
    g = ix.device_graph
    assert g.quant == QUANT_PQ
    old_codes = np.asarray(g.vectors[:600]).copy()

    from lantern_tpu.graph.build_device import device_insert

    extra = rng.standard_normal((40, 32)).astype(np.float32)
    g2 = device_insert(g, extra, labels=np.arange(1000, 1040, dtype=np.uint64),
                       batch=16, seed=1)
    assert g2.quant == QUANT_PQ and g2.pq_codebook is not None
    assert int(g2.num_nodes) == 640
    # old codes unchanged by the round trip
    np.testing.assert_array_equal(np.asarray(g2.vectors[:600]), old_codes)
    # new rows are searchable through the ADC beam; compare against the
    # decoded geometry (what a PQ graph measures)
    dec = pq_decode(np.asarray(g2.vectors[:640]), ix._codebook)
    q = extra[:8]
    d, ids, labels = search_batched(g2, jnp.asarray(q), k=3, ef=48)
    ids = np.asarray(ids)
    # exact ADC oracle: nearest decoded row per query
    want = np.argmin(((dec[None] - q[:, None]) ** 2).sum(-1), axis=1)
    hit = (ids[:, 0] == want).mean()
    assert hit >= 0.75, f"pq insert top-1 agreement {hit}"
    lab = join_labels(np.asarray(labels))
    assert (lab[:, 0][ids[:, 0] >= 600] >= 1000).all()
    validate_device(g2).raise_if_failed()

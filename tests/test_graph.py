"""HNSW graph build + batched search correctness and recall tests.

Mirrors the reference's recall testing strategy: recall@k vs an exact
seq-scan oracle (test/sql/utils/calculate_recall.sql, autotune mod.rs:188-218)
on small deterministic datasets.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.graph import HostHnsw, search_batched, to_device
from lantern_tpu.graph.device import join_labels
from lantern_tpu.ops import exact_search, pack_bits


def _recall(found_ids, true_ids):
    hits = 0
    for f, t in zip(found_ids, true_ids):
        hits += len(set(int(x) for x in f if x >= 0) & set(int(x) for x in t))
    return hits / true_ids.size


@pytest.fixture(scope="module")
def built_l2():
    rng = np.random.default_rng(42)
    base = rng.standard_normal((2000, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=64, metric=Metric.L2SQ)
    h = HostHnsw(p, capacity=2048, seed=1)
    h.add(base, labels=np.arange(2000, dtype=np.uint64) + 100)
    return h, base


def test_host_build_invariants(built_l2):
    h, base = built_l2
    assert h.n == 2000
    assert h.entry >= 0 and h.max_level >= 0
    # degree bounds (validate_index.c:151 semantics)
    assert (h.counts0[: h.n] <= h.p.m0).all()
    assert (h.upper_counts <= h.p.m).all()
    # neighbor ids in range, no self loops at level 0
    for v in range(0, h.n, 97):
        nb = h.neighbors0[v, : h.counts0[v]]
        assert ((nb >= 0) & (nb < h.n)).all()
        assert v not in nb
    # level distribution roughly geometric: most nodes at level 0
    assert (h.levels[: h.n] == 0).mean() > 0.8


def test_host_search_recall(built_l2):
    h, base = built_l2
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((20, 32)).astype(np.float32)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    true_ids = np.asarray(true_ids)
    found = np.stack([h.search(q, k=10, ef=64)[0] for q in queries])
    assert _recall(found, true_ids) >= 0.9


def test_device_search_matches_oracle_recall(built_l2):
    h, base = built_l2
    rng = np.random.default_rng(8)
    queries = rng.standard_normal((32, 32)).astype(np.float32)
    g = to_device(h)
    d, ids, labels = search_batched(g, jnp.array(queries), k=10, ef=64)
    d, ids = np.asarray(d), np.asarray(ids)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    rec = _recall(ids, np.asarray(true_ids))
    assert rec >= 0.9, f"device recall {rec}"
    # labels round-trip (labels were id+100)
    joined = join_labels(np.asarray(labels))
    valid = ids >= 0
    np.testing.assert_array_equal(joined[valid], (ids[valid] + 100).astype(np.uint64))
    # distances ascending
    dd = np.where(np.isfinite(d), d, np.inf)
    assert (np.diff(dd, axis=1) >= -1e-6).all()


def test_device_vs_host_same_graph_close(built_l2):
    """Batched search should find results at least as good as host search."""
    h, base = built_l2
    rng = np.random.default_rng(9)
    queries = rng.standard_normal((8, 32)).astype(np.float32)
    g = to_device(h)
    d_dev, ids_dev, _ = search_batched(g, jnp.array(queries), k=5, ef=48)
    for qi, q in enumerate(queries):
        ids_host, d_host = h.search(q, k=5, ef=48)
        # same graph, same ef: the device search must be at least as good.
        # (It can be strictly better: its entry point is the EXACT nearest
        # upper-level node via a dense scan, while the host's greedy descent
        # can land in a worse basin — observed on 1 of these 8 queries.)
        dd = np.sort(np.asarray(d_dev[qi]))
        dh = np.sort(np.asarray(d_host))
        assert dd[0] <= dh[0] + 1e-3
        assert float(dd.sum()) <= float(dh.sum()) + 1e-2


def test_expand_multi(built_l2):
    h, base = built_l2
    rng = np.random.default_rng(10)
    queries = rng.standard_normal((16, 32)).astype(np.float32)
    g = to_device(h)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    _, ids4, _ = search_batched(g, jnp.array(queries), k=10, ef=64, expand=4)
    assert _recall(np.asarray(ids4), np.asarray(true_ids)) >= 0.9


def test_tombstones_filtered(built_l2):
    h, base = built_l2
    rng = np.random.default_rng(11)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    g = to_device(h)
    _, ids_before, _ = search_batched(g, jnp.array(queries), k=5, ef=48)
    ids_before = np.asarray(ids_before)
    # tombstone every node found for query 0
    import copy
    h2 = copy.deepcopy(h)
    kill_labels = (ids_before[0] + 100).astype(np.uint64)
    n_killed = h2.mark_deleted(kill_labels)
    assert n_killed == len(set(ids_before[0].tolist()))
    g2 = to_device(h2)
    _, ids_after, _ = search_batched(g2, jnp.array(queries), k=5, ef=48)
    ids_after = np.asarray(ids_after)
    live = ids_after[0][ids_after[0] >= 0]
    assert not set(live.tolist()) & set(ids_before[0].tolist())


def test_cosine_graph():
    rng = np.random.default_rng(12)
    base = rng.standard_normal((800, 24)).astype(np.float32)
    p = HnswParams(dim=24, m=8, ef_construction=48, metric=Metric.COS)
    h = HostHnsw(p, seed=3)
    h.add(base)
    queries = rng.standard_normal((16, 24)).astype(np.float32)
    g = to_device(h)
    _, ids, _ = search_batched(g, jnp.array(queries), k=10, ef=64)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10, metric=Metric.COS)
    assert _recall(np.asarray(ids), np.asarray(true_ids)) >= 0.9


def test_hamming_graph():
    rng = np.random.default_rng(13)
    raw = (rng.standard_normal((600, 64)) > 0).astype(np.float32)
    packed = np.asarray(pack_bits(jnp.array(raw)))
    p = HnswParams(dim=64, m=8, ef_construction=48, metric=Metric.HAMMING)
    h = HostHnsw(p, seed=4)
    h.add(packed)
    qraw = (rng.standard_normal((8, 64)) > 0).astype(np.float32)
    qp = np.asarray(pack_bits(jnp.array(qraw)))
    g = to_device(h)
    _, ids, _ = search_batched(g, jnp.array(qp), k=10, ef=64)
    _, true_ids = exact_search(jnp.array(qp), jnp.array(packed), k=10, metric=Metric.HAMMING)
    # hamming has heavy ties on small dims; compare achieved distances instead
    d_found, d_true = [], []
    for qi in range(8):
        dq = np.bitwise_count(np.bitwise_xor(qp[qi][None, :], packed)).sum(1)
        d_found.append(np.sort(dq[np.asarray(ids)[qi]]))
        d_true.append(np.sort(dq[np.asarray(true_ids)[qi]]))
    # found distance profile must be near-oracle
    assert (np.array(d_found) <= np.array(d_true) + 2).mean() >= 0.9


def test_single_node_and_tiny_graphs():
    p = HnswParams(dim=4, m=4, ef_construction=16)
    h = HostHnsw(p, seed=5)
    h.add(np.eye(4, dtype=np.float32)[:1])
    g = to_device(h)
    d, ids, _ = search_batched(g, jnp.array(np.eye(4, dtype=np.float32)[:2]), k=3, ef=8)
    ids = np.asarray(ids)
    assert ids[0, 0] == 0 and (ids[:, 1:] == -1).all()
    h.add(np.eye(4, dtype=np.float32)[1:3])
    g = to_device(h)
    d, ids, _ = search_batched(g, jnp.array(np.eye(4, dtype=np.float32)[:1]), k=3, ef=8)
    assert np.asarray(ids)[0, 0] == 0


def test_search_stats(built_l2):
    """masked_explain analog: per-query search statistics."""
    h, base = built_l2
    rng = np.random.default_rng(99)
    g = to_device(h)
    q = jnp.array(rng.standard_normal((4, 32)).astype(np.float32))
    d, ids, labels, stats = search_batched(g, q, k=5, ef=32, with_stats=True)
    assert int(stats["iterations"]) > 0
    vis = np.asarray(stats["visited"])
    exp = np.asarray(stats["expanded"])
    assert (vis >= exp).all() and (exp >= 1).all()
    assert (vis <= h.n).all()



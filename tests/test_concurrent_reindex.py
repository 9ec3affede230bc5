"""Concurrent reindex/compact tests — the REINDEX CONCURRENTLY analog.

The reference runs REINDEX CONCURRENTLY under live traffic and validates
the index afterwards (test/sql/hnsw_concurrent.sql:1-15). Here: a search
loop runs uninterrupted while reindex_concurrent rebuilds in a background
thread; writes during the rebuild are replayed before the atomic swap.
"""

import threading

import numpy as np

from lantern_tpu.config import HnswParams
from lantern_tpu.index import Index

DIM = 24
P = HnswParams(dim=DIM, m=8, ef_construction=48, ef=64)


def test_reindex_concurrent_search_loop(rng):
    """Zero failed queries while a compact-reindex runs; post-swap parity."""
    base = rng.standard_normal((1500, DIM)).astype(np.float32)
    qs = rng.standard_normal((8, DIM)).astype(np.float32)
    ix = Index(P, capacity=2048, seed=3)
    ix.add(base)
    ix.delete(np.arange(0, 300, dtype=np.uint64))  # tombstones to reclaim

    # warm the compiled search programs BEFORE the loop so the thread
    # doesn't measure compile stalls
    d0, l0 = ix.search(qs, k=10, mode="flat")

    stop = threading.Event()
    failures: list[BaseException] = []
    results: list[np.ndarray] = []

    def search_loop():
        try:
            while not stop.is_set():
                d, lab = ix.search(qs, k=10, mode="flat")
                assert lab.shape == (8, 10)
                # tombstoned labels never surface (old OR new engine)
                assert (lab >= 300).all()
                results.append(lab)
        except BaseException as e:  # pragma: no cover - failure reporting
            failures.append(e)

    t = threading.Thread(target=search_loop)
    t.start()
    try:
        h = ix.reindex_concurrent()
        assert h.join(timeout=600)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not failures, failures
    assert len(results) > 0  # the loop really ran during the rebuild
    assert ix.num_deleted == 0  # tombstones reclaimed
    assert ix.size == 1200
    # post-swap parity: the exact flat scan over the live set is unchanged
    d1, l1 = ix.search(qs, k=10, mode="flat")
    np.testing.assert_array_equal(l0, l1)


def test_reindex_concurrent_replays_writes(rng):
    """add()/delete() landing during the rebuild survive the swap."""
    base = rng.standard_normal((800, DIM)).astype(np.float32)
    extra = rng.standard_normal((40, DIM)).astype(np.float32)
    ix = Index(P, capacity=1024, seed=3)
    ix.add(base)
    ix.delete(np.arange(100, dtype=np.uint64))

    h = ix.reindex_concurrent()
    # writer traffic during the rebuild (single-writer contract)
    ix.add(extra, labels=np.arange(1000, 1040, dtype=np.uint64))
    ix.delete(np.asarray([1000, 1001, 200], dtype=np.uint64))
    assert h.join(timeout=600)

    # everything acknowledged before the swap is present afterwards; the
    # deletes either land before the swap (added-then-deleted rows are
    # compacted away, 200 tombstoned: 700+38 rows / 1 tombstone) or after
    # it (all 40 adds replayed, 3 tombstones)
    assert (ix.size, ix.num_deleted) in {(738, 1), (740, 3)}
    q = extra[5]
    d, lab = ix.search(q, k=1, mode="flat")
    assert lab[0, 0] == 1005
    # deletes replayed: tombstoned labels never surface
    d, lab = ix.search(extra[:2], k=5, mode="flat")
    assert 1000 not in set(lab.ravel().tolist())
    assert 1001 not in set(lab.ravel().tolist())
    rows = ix.rows_for_labels(np.asarray([200], dtype=np.uint64))
    # label 200 was deleted mid-rebuild: either compacted away later or
    # tombstoned now
    if rows[0] >= 0:
        assert bool(np.asarray(ix._eng.deleted)[rows[0]])

    # a second stop-the-world compact still agrees (sanity)
    ix.compact()
    d2, lab2 = ix.search(q, k=1, mode="flat")
    assert lab2[0, 0] == 1005


def test_reindex_concurrent_reparametrize(rng):
    """New graph params (m/efc) apply at the swap; dim/metric changes
    refuse (compact() semantics)."""
    import pytest

    base = rng.standard_normal((400, DIM)).astype(np.float32)
    ix = Index(P, capacity=512, seed=3)
    ix.add(base)
    p2 = HnswParams(dim=DIM, m=12, ef_construction=64, ef=64)
    h = ix.reindex_concurrent(params=p2)
    assert h.join(timeout=600)
    assert ix.params.m == 12
    rep = ix.validate()
    rep.raise_if_failed()
    with pytest.raises(ValueError, match="cannot change"):
        ix.reindex_concurrent(params=HnswParams(dim=DIM + 1, m=8))

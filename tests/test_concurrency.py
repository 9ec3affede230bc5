"""Concurrent insert + search against the native engine.

Analog of the reference's parallel regression schedule (test/parallel/:
3 concurrent inserters + 1 selector against one database,
test/parallel_schedule.txt:7-9) — ctypes releases the GIL during engine
calls, so these threads genuinely interleave inside the C++ engine.
"""

import threading

import numpy as np
import pytest

from lantern_tpu.config import HnswParams
from lantern_tpu.graph.validate import validate
from lantern_tpu.native import NativeHnsw


def test_concurrent_insert_and_search(rng):
    n_total = 4000
    dim = 24
    base = rng.standard_normal((n_total, dim)).astype(np.float32)
    p = HnswParams(dim=dim, m=8, ef_construction=48)
    ix = NativeHnsw(p, capacity=n_total, seed=0)
    ix.add(base[:500])  # seed graph so searches have something to walk

    errors = []
    stop = threading.Event()

    def inserter(lo, hi):
        try:
            for start in range(lo, hi, 100):
                ix.add(base[start : start + 100],
                       labels=np.arange(start, start + 100, dtype=np.uint64),
                       nthreads=1)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def searcher():
        try:
            qi = 0
            while not stop.is_set():
                q = base[qi % 500]
                ids, dists = ix.search(q, k=5, ef=32)
                assert len(ids) >= 1
                assert (dists[:-1] <= dists[1:] + 1e-5).all()
                qi += 1
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=inserter, args=(500, 1700)),
        threading.Thread(target=inserter, args=(1700, 2900)),
        threading.Thread(target=inserter, args=(2900, 4000)),
    ]
    s = threading.Thread(target=searcher)
    s.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    stop.set()
    s.join(30)

    assert not errors, errors
    assert ix.n == n_total
    # invariants hold after concurrent construction (end.sql analog)
    rep = validate(ix, full=True, min_reachable_frac=0.95)
    rep.raise_if_failed()
    # every inserted label findable by its own vector
    for probe in (600, 1800, 3000, 3999):
        ids, dists = ix.search(base[probe], k=1, ef=64)
        assert len(ids) == 1
        if dists[0] > 1e-5:  # exact self-match expected
            pytest.fail(f"node {probe} not found by its own vector: {ids} {dists}")

"""Streaming scan semantics + bench timers tests."""

import numpy as np

from lantern_tpu import HnswParams, Index
from lantern_tpu.utils import bench as lbench


def test_streaming_search_grows_k(rng):
    base = rng.standard_normal((300, 8)).astype(np.float32)
    ix = Index(HnswParams(dim=8, m=8, ef_construction=32), capacity=300)
    ix.add(base)
    gen = ix.search_streaming(base[42], init_k=4, ef=64)
    rows = [next(gen) for _ in range(30)]  # way past init_k: forces re-search
    labels = [lab for _, lab in rows]
    assert labels[0] == 42
    assert len(set(labels)) == 30  # no duplicates across re-searches
    dists = [d for d, _ in rows]
    assert all(b >= a - 1e-5 for a, b in zip(dists, dists[1:]))


def test_streaming_exhausts_small_index(rng):
    base = rng.standard_normal((12, 8)).astype(np.float32)
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=12)
    ix.add(base)
    rows = list(ix.search_streaming(base[0], init_k=4, ef=32))
    assert len(rows) == 12  # everything reachable, then stop


def test_bench_timers():
    lbench.reset()
    lbench.enable(True)
    try:
        with lbench.bench("op"):
            sum(range(1000))
        with lbench.bench("op"):
            sum(range(1000))

        @lbench.benched("fn")
        def f():
            return 1

        f()
        s = lbench.stats()
        assert s["op"]["count"] == 2 and s["op"]["avg_s"] > 0
        assert s["fn"]["count"] == 1
    finally:
        lbench.enable(False)
        lbench.reset()

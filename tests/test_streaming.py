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


def test_streaming_no_recompile_ladder(rng):
    """The streaming scan quantizes k to STREAM_TIERS: consuming far past
    init_k triggers at most one beam program per tier REACHED, and a second
    streaming pass on a warm cache compiles NOTHING new (the reference's
    in-scan resume is cheap, scan.c:240-292; per-doubling recompiles
    through the compile tunnel would be minutes per step)."""
    from lantern_tpu.graph.search import search_batched

    base = rng.standard_normal((500, 8)).astype(np.float32)
    ix = Index(HnswParams(dim=8, m=8, ef_construction=32), capacity=500)
    ix.add(base)
    gen = ix.search_streaming(base[7], init_k=4, ef=64)
    rows = [next(gen) for _ in range(100)]  # crosses the 64-tier into 256
    assert len({lab for _, lab in rows}) == 100
    warm = search_batched._cache_size()
    # a second full consume on the warm cache: ZERO new compiles
    gen2 = ix.search_streaming(base[8], init_k=4, ef=64)
    rows2 = [next(gen2) for _ in range(100)]
    assert len(rows2) == 100
    assert search_batched._cache_size() == warm
    # tier quantization bounds the ladder: k values used are from STREAM_TIERS
    assert set(Index.STREAM_TIERS) == {64, 256, 1000}


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

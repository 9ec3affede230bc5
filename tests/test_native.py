"""Native C++ engine tests: parity with the Python reference builder."""

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.graph import search_batched, to_device
from lantern_tpu.native import NativeHnsw
from lantern_tpu.ops import exact_search


def _recall(found_ids, true_ids):
    hits = 0
    for f, t in zip(found_ids, true_ids):
        hits += len(set(int(x) for x in f if x >= 0) & set(int(x) for x in t))
    return hits / true_ids.size


@pytest.fixture(scope="module")
def native_l2():
    rng = np.random.default_rng(20)
    base = rng.standard_normal((3000, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=64)
    ix = NativeHnsw(p, capacity=3000, seed=1)
    ix.add(base, nthreads=1)
    return ix, base


def test_native_build_and_search(native_l2):
    ix, base = native_l2
    assert ix.n == 3000
    assert (ix.counts0[: ix.n] <= ix.p.m0).all()
    rng = np.random.default_rng(21)
    queries = rng.standard_normal((20, 32)).astype(np.float32)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    found = np.stack([
        np.pad(ix.search(q, k=10, ef=64)[0], (0, 10), constant_values=-1)[:10]
        for q in queries
    ])
    assert _recall(found, np.asarray(true_ids)) >= 0.9


def test_native_to_device_search(native_l2):
    ix, base = native_l2
    rng = np.random.default_rng(22)
    queries = rng.standard_normal((16, 32)).astype(np.float32)
    g = to_device(ix)
    _, ids, _ = search_batched(g, jnp.array(queries), k=10, ef=64)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    assert _recall(np.asarray(ids), np.asarray(true_ids)) >= 0.9


def test_native_threaded_build():
    rng = np.random.default_rng(23)
    base = rng.standard_normal((2000, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = NativeHnsw(p, capacity=2000, seed=2)
    ix.add(base, nthreads=4)  # oversubscribed on 1 core; exercises locking
    assert ix.n == 2000
    queries = rng.standard_normal((10, 16)).astype(np.float32)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    found = np.stack([
        np.pad(ix.search(q, k=10, ef=64)[0], (0, 10), constant_values=-1)[:10]
        for q in queries
    ])
    assert _recall(found, np.asarray(true_ids)) >= 0.85
    # graph structurally sound after concurrent build
    n0 = ix.neighbors0[: ix.n]
    c0 = ix.counts0[: ix.n]
    for v in range(0, 2000, 131):
        nb = n0[v, : c0[v]]
        assert ((nb >= 0) & (nb < 2000)).all() and v not in nb


def test_native_capacity_overflow():
    p = HnswParams(dim=8, m=4, ef_construction=16)
    ix = NativeHnsw(p, capacity=8, seed=0)
    ix.add(np.zeros((8, 8), np.float32))
    with pytest.raises(MemoryError):
        ix.add(np.zeros((1, 8), np.float32))


def test_native_delete(native_l2):
    import copy  # noqa: F401
    rng = np.random.default_rng(24)
    base = rng.standard_normal((500, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = NativeHnsw(p, capacity=500, seed=9)
    ix.add(base)
    q = base[7]
    ids, _ = ix.search(q, k=1, ef=32)
    assert ids[0] == 7
    assert ix.mark_deleted(np.array([7], np.uint64)) == 1
    ids, _ = ix.search(q, k=1, ef=32)
    assert len(ids) == 0 or ids[0] != 7


def test_native_hamming():
    rng = np.random.default_rng(25)
    packed = rng.integers(0, 2**32, size=(400, 2), dtype=np.uint32)
    p = HnswParams(dim=64, m=8, ef_construction=48, metric=Metric.HAMMING)
    ix = NativeHnsw(p, capacity=400, seed=3)
    ix.add(packed)
    q = packed[11]
    ids, dists = ix.search(q, k=1, ef=32)
    assert dists[0] == 0.0  # exact self-match

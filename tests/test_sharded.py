"""Sharded-index tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams
from lantern_tpu.graph.device import join_labels
from lantern_tpu.ops import exact_search
from lantern_tpu.parallel import build_sharded, make_mesh, search_sharded


def _recall(found_ids, true_ids):
    hits = 0
    for f, t in zip(found_ids, true_ids):
        hits += len(set(int(x) for x in f if x >= 0) & set(int(x) for x in t))
    return hits / true_ids.size


@pytest.fixture(scope="module")
def sharded_ix():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    rng = np.random.default_rng(30)
    # 2400 x 16 (300 rows/shard): big enough for recall bars, small enough
    # that the compact_sharded rebuild (the file's largest XLA:CPU compile)
    # stays cheap — this file is compile-time-bound (265 s measured r4)
    base = rng.standard_normal((2400, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded(base, p, mesh, seed=0)
    return ix, base, mesh


def test_sharded_recall(sharded_ix):
    ix, base, mesh = sharded_ix
    rng = np.random.default_rng(31)
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    d, gids, labels = search_sharded(ix, jnp.array(queries), k=10, ef=48)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    rec = _recall(np.asarray(gids), np.asarray(true_ids))
    assert rec >= 0.9, f"sharded recall {rec}"
    # labels == global ids by construction here
    joined = join_labels(np.asarray(labels))
    gids = np.asarray(gids)
    valid = gids >= 0
    np.testing.assert_array_equal(joined[valid].astype(np.int64), gids[valid])


def test_sharded_placement(sharded_ix):
    ix, base, mesh = sharded_ix
    # the vectors must actually be sharded over the mesh's shard axis
    shardings = {
        d.device for d in ix.graphs.vectors.addressable_shards
    }
    assert len(shardings) == 8
    assert ix.graphs.vectors.sharding.spec[0] == "shard"


def test_sharded_dedup_distances_sorted(sharded_ix):
    ix, base, mesh = sharded_ix
    rng = np.random.default_rng(32)
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    d, gids, _ = search_sharded(ix, jnp.array(queries), k=20, ef=48)
    d = np.asarray(d)
    dd = np.where(np.isfinite(d), d, np.inf)
    assert (np.diff(dd, axis=1) >= -1e-6).all()
    # no duplicate global ids per query
    gids = np.asarray(gids)
    for row in gids:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)


def test_sharded_small_n():
    rng = np.random.default_rng(33)
    base = rng.standard_normal((16, 8)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    ix = build_sharded(base, p, mesh, seed=1)
    q = jnp.array(base[:3])
    d, gids, _ = search_sharded(ix, q, k=1, ef=8)
    np.testing.assert_array_equal(np.asarray(gids)[:, 0], [0, 1, 2])
    with pytest.raises(ValueError):
        build_sharded(base[:4], p, mesh)


def test_build_sharded_device_parallel():
    """All-shard parallel device build (external-index fleet analog)."""
    import jax.numpy as jnp

    from lantern_tpu.parallel import build_sharded_device

    rng = np.random.default_rng(40)
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded_device(base, p, mesh, batch=128, seed=0)
    assert ix.graphs.vectors.sharding.spec[0] == "shard"
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    d, gids, labels = search_sharded(ix, jnp.array(queries), k=10, ef=48)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    rec = _recall(np.asarray(gids), np.asarray(true_ids))
    assert rec >= 0.88, f"parallel device build recall {rec}"
    # labels are global ids here
    joined = join_labels(np.asarray(labels))
    gids_np = np.asarray(gids)
    ok = gids_np >= 0
    np.testing.assert_array_equal(joined[ok].astype(np.int64), gids_np[ok])
    # self queries hit themselves
    d2, g2, _ = search_sharded(ix, jnp.array(base[:8]), k=1, ef=16)
    np.testing.assert_array_equal(np.asarray(g2)[:, 0], np.arange(8))


def test_build_sharded_device_bf16_store():
    """store="bf16" sharded build: bf16 tables per shard, recall parity."""
    import jax.numpy as jnp

    from lantern_tpu.parallel import build_sharded_device

    rng = np.random.default_rng(41)
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded_device(base, p, mesh, batch=128, seed=0, store="bf16")
    assert ix.graphs.vectors.dtype == jnp.bfloat16
    assert ix.graphs.vectors.sharding.spec[0] == "shard"
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    d, gids, _ = search_sharded(ix, jnp.array(queries), k=10, ef=48)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    rec = _recall(np.asarray(gids), np.asarray(true_ids))
    assert rec >= 0.85, f"bf16-store sharded build recall {rec}"


def test_build_sharded_device_hybrid_candidates():
    """candidates="hybrid" on the mesh: each shard switches flat->beam at
    flat_until built nodes; both pool kinds execute, recall holds."""
    from lantern_tpu.parallel import build_sharded_device

    rng = np.random.default_rng(43)
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded_device(base, p, mesh, batch=128, seed=0,
                              candidates="hybrid", flat_until=64)
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    d, gids, _ = search_sharded(ix, jnp.array(queries), k=10, ef=64)
    _, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    rec = _recall(np.asarray(gids), np.asarray(true_ids))
    assert rec >= 0.8, f"hybrid sharded build recall {rec}"


def test_build_sharded_device_hamming():
    """Sharded device build over packed-bit vectors (hamming metric) —
    closes the metric matrix for the parallel build path."""
    import jax.numpy as jnp

    from lantern_tpu.config import Metric, QuantKind
    from lantern_tpu.ops import pack_bits
    from lantern_tpu.parallel import build_sharded_device

    rng = np.random.default_rng(41)
    raw = rng.standard_normal((800, 64)).astype(np.float32)
    packed = np.asarray(pack_bits(raw))  # [n, 2] u32 words
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=64, m=8, ef_construction=48, metric=Metric.HAMMING,
                   quant=QuantKind.B1)
    ix = build_sharded_device(packed, p, mesh, batch=128, seed=0)
    q = packed[:16]
    d, gids, _ = search_sharded(ix, jnp.asarray(q), k=10, ef=48)
    # numpy exact-hamming oracle
    hd = np.bitwise_count(
        np.bitwise_xor(q[:, None, :], packed[None, :, :])
    ).sum(-1)
    true_ids = np.argsort(hd, axis=1, kind="stable")[:, :10]
    rec = _recall(np.asarray(gids), true_ids)
    assert rec >= 0.8, f"sharded hamming recall {rec}"
    # self queries at distance 0
    assert (np.asarray(gids)[:, 0] == np.arange(16)).all()
    assert (np.asarray(d)[:, 0] == 0).all()


def test_sharded_save_load_roundtrip(sharded_ix, tmp_path):
    """Per-shard snapshots + manifest: identical search results after reload
    (the external fleet's save/stream path, server.rs:377-434 analog)."""
    from lantern_tpu.parallel.sharded import load_sharded, save_sharded

    ix, base, mesh = sharded_ix
    d = str(tmp_path / "sharded")
    save_sharded(ix, d)
    ix2 = load_sharded(d, mesh)
    q = jnp.array(base[:8])
    d1, g1, _ = search_sharded(ix, q, k=5, ef=48)
    d2, g2, _ = search_sharded(ix2, q, k=5, ef=48)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    # shard files are independently loadable by the single-index tooling
    from lantern_tpu.storage.snapshot import load_snapshot

    eng0 = load_snapshot(str(tmp_path / "sharded" / "shard_0.ldb"))
    assert eng0.n > 0


def test_sharded_save_load_bf16_store(tmp_path):
    """bf16 vector tables snapshot faithfully (regression: dtype.str of
    ml_dtypes.bfloat16 is opaque '<V2' — untagged, the loader reinterpreted
    the bytes as f32 garbage and read out of bounds in the C import)."""
    from lantern_tpu.parallel import build_sharded_device
    from lantern_tpu.parallel.sharded import load_sharded, save_sharded

    rng = np.random.default_rng(43)
    # same (1200, 16, efc 48, batch 128) bf16 shape as
    # test_build_sharded_device_bf16_store: the build program jit-caches
    base = rng.standard_normal((1200, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded_device(base, p, mesh, batch=128, seed=0, store="bf16")
    d = str(tmp_path / "bf16_sharded")
    save_sharded(ix, d)
    ix2 = load_sharded(d, mesh)
    # values survive the round trip exactly (bf16 -> f32 widening is exact)
    v0 = np.asarray(ix.graphs.vectors[0, :8], np.float32)
    v0b = np.asarray(ix2.graphs.vectors[0, :8], np.float32)
    np.testing.assert_array_equal(v0, v0b)
    q = jnp.array(base[:8])
    _, g1, _ = search_sharded(ix, q, k=5, ef=48)
    _, g2, _ = search_sharded(ix2, q, k=5, ef=48)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_sharded_insert_delete(tmp_path):
    """Post-build insert routes to round-robin owners; delete tombstones
    across shards; recall holds after both."""
    from lantern_tpu.parallel.sharded import (
        delete_sharded,
        insert_sharded,
        make_mesh,
    )

    rng = np.random.default_rng(33)
    base = rng.standard_normal((1600, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded(base[:1200], p, mesh, seed=0)
    ix = insert_sharded(ix, base[1200:], mesh, batch=64, seed=1)
    q = jnp.array(base[1200:1208])
    d, gids, _ = search_sharded(ix, q, k=1, ef=32)
    np.testing.assert_array_equal(
        np.asarray(gids)[:, 0], np.arange(1200, 1208)
    )
    _, tids = exact_search(jnp.array(base[::151]), jnp.array(base), k=10)
    _, g10, _ = search_sharded(ix, jnp.array(base[::151]), k=10, ef=64)
    rec = _recall(np.asarray(g10), np.asarray(tids))
    assert rec >= 0.85, f"post-insert recall {rec}"
    # delete a few of the new nodes
    ix = delete_sharded(ix, np.arange(1200, 1204, dtype=np.uint64))
    _, gids2, _ = search_sharded(ix, q, k=3, ef=32)
    assert not np.isin(np.asarray(gids2), np.arange(1200, 1204)).any()


def test_sharded_insert_no_host_roundtrip(monkeypatch):
    """insert_sharded runs ON the mesh: the vector/adjacency arrays never
    round-trip through the host — only O(cap) metadata (levels, counts,
    upper ids) is fetched. Guards the hot path: the old implementation
    pulled S full graph copies per trickle insert."""
    import time

    from lantern_tpu.parallel.sharded import insert_sharded

    rng = np.random.default_rng(77)
    base = rng.standard_normal((1600, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded(base[:1200], p, mesh, seed=0)
    vec_bytes = ix.graphs.vectors.nbytes
    nbr_bytes = ix.graphs.neighbors0.nbytes
    fetched: list[int] = []
    orig = jax.device_get

    def spy(x):
        for leaf in jax.tree.leaves(x):
            nb = getattr(leaf, "nbytes", 0)
            if nb:
                fetched.append(int(nb))
        return orig(x)

    monkeypatch.setattr(jax, "device_get", spy)
    t0 = time.perf_counter()
    ix2 = insert_sharded(ix, base[1200:], mesh, batch=64, seed=1)
    jax.block_until_ready(ix2.graphs.neighbors0)
    dt = time.perf_counter() - t0
    monkeypatch.undo()
    biggest = max(fetched) if fetched else 0
    assert biggest < min(vec_bytes, nbr_bytes) // 4, (
        f"insert fetched a {biggest}-byte array from device "
        f"(vectors={vec_bytes}, neighbors={nbr_bytes}) — full-graph host "
        "round-trip reintroduced?"
    )
    print(f"\ninsert_sharded 400 rows over 8 shards: {dt:.2f}s "
          f"(max host fetch {biggest} B vs {vec_bytes} B vectors)")
    # parity: inserted vectors are findable, recall holds
    q = jnp.array(base[1200:1208])
    _, gids, _ = search_sharded(ix2, q, k=1, ef=32)
    np.testing.assert_array_equal(
        np.asarray(gids)[:, 0], np.arange(1200, 1208)
    )
    _, tids = exact_search(jnp.array(base[::111]), jnp.array(base), k=10)
    _, g10, _ = search_sharded(ix2, jnp.array(base[::111]), k=10, ef=64)
    rec = _recall(np.asarray(g10), np.asarray(tids))
    assert rec >= 0.85, f"post-insert recall {rec}"


def test_sharded_insert_grows_capacity():
    """Insert past the stacked capacity: doubling growth on the mesh."""
    from lantern_tpu.parallel.sharded import insert_sharded

    rng = np.random.default_rng(78)
    base = rng.standard_normal((2000, 16)).astype(np.float32)
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=16, m=8, ef_construction=48)
    ix = build_sharded(base[:400], p, mesh, seed=0)
    cap0 = ix.graphs.vectors.shape[1]
    ix = insert_sharded(ix, base[400:], mesh, batch=64, seed=1)
    assert ix.graphs.vectors.shape[1] > cap0
    assert int(np.asarray(jax.device_get(ix.graphs.num_nodes)).sum()) == 2000
    # every vector findable as its own nearest neighbor
    probes = np.r_[0:8, 396:404, 1992:2000]
    q = jnp.array(base[probes])
    _, gids, _ = search_sharded(ix, q, k=1, ef=32)
    np.testing.assert_array_equal(np.asarray(gids)[:, 0], probes)
    # and a second insert composes (upper-slot bookkeeping stays aligned)
    extra = rng.standard_normal((64, 16)).astype(np.float32)
    ix = insert_sharded(ix, extra, mesh, batch=32, seed=2)
    _, g2, _ = search_sharded(ix, jnp.array(extra[:8]), k=1, ef=32)
    np.testing.assert_array_equal(
        np.asarray(g2)[:, 0], np.arange(2000, 2008)
    )


def test_sharded_flat_exact_matches_oracle(sharded_ix):
    """flat_search_sharded(exact=True) == global exact top-k (the per-shard
    exact top-k composes exactly through the merge)."""
    from lantern_tpu.parallel import flat_search_sharded

    ix, base, mesh = sharded_ix
    rng = np.random.default_rng(32)
    queries = rng.standard_normal((12, 16)).astype(np.float32)
    d, gids, labels = flat_search_sharded(ix, jnp.array(queries), k=10,
                                          exact=True)
    true_d, true_ids = exact_search(jnp.array(queries), jnp.array(base), k=10)
    np.testing.assert_array_equal(np.asarray(gids), np.asarray(true_ids))
    np.testing.assert_allclose(np.asarray(d), np.asarray(true_d),
                               rtol=2e-4, atol=2e-4)
    joined = join_labels(np.asarray(labels))
    np.testing.assert_array_equal(joined.astype(np.int64), np.asarray(gids))


def test_sharded_flat_respects_tombstones(sharded_ix):
    from lantern_tpu.parallel import flat_search_sharded
    from lantern_tpu.parallel.sharded import delete_sharded

    ix, base, mesh = sharded_ix
    queries = base[:4]
    _, gids0, _ = flat_search_sharded(ix, jnp.array(queries), k=5, exact=True)
    assert (np.asarray(gids0)[:, 0] == np.arange(4)).all()
    ix2 = delete_sharded(ix, np.arange(4, dtype=np.uint64))
    _, gids1, _ = flat_search_sharded(ix2, jnp.array(queries), k=5, exact=True)
    assert not np.isin(np.asarray(gids1), np.arange(4)).any()


def test_sharded_filtered_search(sharded_ix):
    """exclude_gids predicate filter on both sharded search paths."""
    from lantern_tpu.parallel.sharded import flat_search_sharded

    ix, base, mesh = sharded_ix
    n = len(base)
    q = jnp.array(base[:4])
    _, g0, _ = search_sharded(ix, q, k=3, ef=48)
    top = int(np.asarray(g0)[0, 0])  # the true top hit (query 0 itself)
    mask = np.zeros(n, bool)
    mask[top] = True
    excl = jnp.array(mask)
    for fn in (lambda: search_sharded(ix, q, k=3, ef=48, exclude_gids=excl),
               lambda: flat_search_sharded(ix, q, k=3, exact=True,
                                           exclude_gids=excl)):
        d, gids, _ = fn()
        gids = np.asarray(gids)
        assert top not in gids[0].tolist()
        assert (np.asarray(d)[0] < np.inf).all()
    # allow-style mask: exclude everything but 16 ids -> results within them
    allow = np.zeros(n, bool); allow[:] = True; allow[100:116] = False
    d, gids, _ = flat_search_sharded(ix, q, k=5, exact=True,
                                     exclude_gids=jnp.array(allow))
    got = np.asarray(gids)[0]
    assert set(got[got >= 0].tolist()) <= set(range(100, 116))


def test_local_exclude_masks_semantics(sharded_ix):
    """Precomputed local masks; short masks leave uncovered gids unfiltered
    (regression: clip silently mapped them onto the mask's last entry)."""
    from lantern_tpu.parallel.sharded import (flat_search_sharded,
                                              local_exclude_masks)

    ix, base, mesh = sharded_ix
    n = len(base)
    # short mask ending in True: gids >= its length must stay searchable
    short = np.zeros(16, bool)
    short[15] = True
    masks = np.asarray(local_exclude_masks(ix, jnp.array(short)))
    gids = np.asarray(ix.global_ids)[:, : masks.shape[1]]
    covered_excl = masks[(gids >= 0) & (gids < 16)]
    assert covered_excl.sum() > 0  # gid 15 excluded somewhere
    assert not masks[(gids >= 16)].any()  # uncovered gids NOT excluded
    assert masks[(gids < 0)].all()  # blank slots always excluded
    # precomputed 2D masks give the same results as the 1D path
    full = np.zeros(n, bool)
    full[:50] = True
    q = jnp.array(base[:4])
    d1, g1, _ = flat_search_sharded(ix, q, k=5, exact=True,
                                    exclude_gids=jnp.array(full))
    d2, g2, _ = flat_search_sharded(ix, q, k=5, exact=True,
                                    exclude_gids=local_exclude_masks(
                                        ix, jnp.array(full)))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert not (set(np.asarray(g1)[0].tolist()) & set(range(50)))


def test_compact_sharded(sharded_ix):
    """compact_sharded rebuilds the live set in parallel (Index.compact's
    multi-chip analog); labels preserved, tombstones gone."""
    from lantern_tpu.parallel.sharded import compact_sharded, delete_sharded

    ix, base, mesh = sharded_ix
    n = len(base)
    dead_labels = np.arange(0, n // 2, dtype=np.uint64)
    ix2 = delete_sharded(ix, dead_labels)
    ix3 = compact_sharded(ix2, mesh, batch=128, seed=0)
    live = int(np.asarray(jnp.sum(~ix3.graphs.deleted &
                                  (ix3.global_ids[:, :-1] >= 0))))
    assert live == n - n // 2
    # deleted labels never surface; a live vector still finds itself
    q = jnp.array(base[n // 2: n // 2 + 4])
    d, gids, labels = search_sharded(ix3, q, k=3, ef=48)
    found = join_labels(np.asarray(labels))
    assert (found[:, 0] == np.arange(n // 2, n // 2 + 4)).all()
    assert not (set(found.ravel().tolist()) & set(dead_labels.tolist()))

"""Snapshot / insert-log / validator / Index facade tests.

Reference analogs: WAL crash-recovery tests (scripts/test_wal.py),
validate_index regression usage, version-mismatch behavior (scan.c:103-105).
"""

import os
import struct

import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.costmodel import estimate_search_cost
from lantern_tpu.graph.validate import validate
from lantern_tpu.index import Index
from lantern_tpu.native import NativeHnsw
from lantern_tpu.storage import InsertLog, load_snapshot, save_snapshot


@pytest.fixture(scope="module")
def small_engine():
    rng = np.random.default_rng(50)
    base = rng.standard_normal((1200, 24)).astype(np.float32)
    p = HnswParams(dim=24, m=8, ef_construction=48)
    ix = NativeHnsw(p, capacity=1200, seed=7)
    ix.add(base)
    return ix, base


def test_validate_good_graph(small_engine):
    ix, _ = small_engine
    rep = validate(ix, full=True)
    rep.raise_if_failed()
    assert rep.n_reachable >= 0.98 * rep.n


def test_validate_catches_corruption(small_engine):
    import copy

    from lantern_tpu.graph.host_build import HostHnsw

    # corrupt a python-engine copy (native arrays are zero-copy views)
    rng = np.random.default_rng(51)
    base = rng.standard_normal((300, 8)).astype(np.float32)
    p = HnswParams(dim=8, m=4, ef_construction=16)
    h = HostHnsw(p, seed=1)
    h.add(base)
    bad = copy.deepcopy(h)
    bad.neighbors0[5, 0] = 299999  # out of range
    assert not validate(bad).ok
    bad2 = copy.deepcopy(h)
    bad2.counts0[3] = 99
    assert not validate(bad2).ok
    bad3 = copy.deepcopy(h)
    bad3.neighbors0[7, 0] = 7  # self loop
    assert not validate(bad3, full=False).ok


def test_snapshot_roundtrip(small_engine, tmp_path):
    ix, base = small_engine
    path = str(tmp_path / "ix.ldb")
    save_snapshot(ix, path)
    for engine in ("native", "python"):
        ix2 = load_snapshot(path, engine=engine)
        assert ix2.n == ix.n
        assert ix2.entry == ix.entry and ix2.max_level == ix.max_level
        np.testing.assert_array_equal(
            np.asarray(ix2.neighbors0[: ix.n]), np.asarray(ix.neighbors0[: ix.n])
        )
        np.testing.assert_array_equal(
            np.asarray(ix2.vectors[: ix.n]), np.asarray(ix.vectors[: ix.n])
        )
        # identical search results
        q = base[3]
        ids1, d1 = ix.search(q, k=5, ef=32)
        ids2, d2 = ix2.search(q, k=5, ef=32)
        np.testing.assert_array_equal(ids1, ids2)
        validate(ix2).raise_if_failed()


def test_snapshot_version_check(small_engine, tmp_path):
    ix, _ = small_engine
    path = str(tmp_path / "bad.ldb")
    save_snapshot(ix, path)
    raw = bytearray(open(path, "rb").read())
    raw[4:8] = struct.pack("<I", 999)  # bump version field
    open(path, "wb").write(raw)
    with pytest.raises(ValueError, match="rebuild"):
        load_snapshot(path)
    raw[0:4] = struct.pack("<I", 0xDEADBEEF)
    open(path, "wb").write(raw)
    with pytest.raises(ValueError, match="magic"):
        load_snapshot(path)


def test_snapshot_crc_detects_corruption(small_engine, tmp_path):
    ix, _ = small_engine
    path = str(tmp_path / "corrupt.ldb")
    save_snapshot(ix, path)
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # flip a byte mid-arrays
    open(path, "wb").write(raw)
    with pytest.raises(ValueError):
        load_snapshot(path)


def test_insert_log_roundtrip_and_torn_tail(tmp_path):
    path = str(tmp_path / "wal.log")
    log = InsertLog(path, width=4)
    vecs = np.arange(12, dtype=np.float32).reshape(3, 4)
    log.append(vecs, np.array([10, 11, 12], np.uint64))
    log.close()
    v, lab = InsertLog.replay(path, 4)
    np.testing.assert_array_equal(v, vecs)
    np.testing.assert_array_equal(lab, [10, 11, 12])
    # torn tail: append garbage half-record
    with open(path, "ab") as f:
        f.write(b"\x01\x02\x03")
    v, lab = InsertLog.replay(path, 4)
    assert len(v) == 3  # tail discarded, prefix intact
    # REOPENING after a torn tail must truncate it first: records
    # appended after torn bytes would be unreachable on the next replay
    # (scan stops at the first bad record)
    log2 = InsertLog(path, width=4)
    assert log2.count == 3
    log2.append(np.full((1, 4), 9.0, np.float32), np.array([13], np.uint64))
    log2.close()
    v, lab = InsertLog.replay(path, 4)
    assert len(v) == 4 and lab[-1] == 13
    with open(path, "ab") as f:
        f.write(b"\x01\x02\x03")  # re-tear for the crc case below
    # corrupt the last record's payload: crc must reject it
    raw = bytearray(open(path, "rb").read())
    raw = raw[:-3]  # drop the tear, corrupt the real last record
    raw[-5] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    v, lab = InsertLog.replay(path, 4)
    assert len(v) == 3


def test_index_facade_end_to_end(tmp_path):
    rng = np.random.default_rng(52)
    base = rng.standard_normal((600, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=64)
    ix.add(base[:500], labels=np.arange(500, dtype=np.uint64) + 1000)
    assert ix.size == 500  # capacity auto-grew 64 -> 512+
    d, labels = ix.search(base[:4], k=3, ef=32)
    assert labels[0, 0] == 1000 and d[0, 0] < 1e-3
    # delete + re-query
    assert ix.delete(np.array([1000], np.uint64)) == 1
    d, labels = ix.search(base[:1], k=3, ef=32)
    assert 1000 not in labels[0]
    # save / load round trip
    path = str(tmp_path / "facade.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    assert ix2.size == 500 and ix2.num_deleted == 1
    d2, labels2 = ix2.search(base[:4], k=3, ef=32)
    np.testing.assert_array_equal(labels[0], labels2[0])
    ix2.validate().raise_if_failed()


def test_index_crash_resume_via_log(tmp_path):
    """Snapshot + insert-log replay == WAL crash recovery (test_wal.py analog)."""
    rng = np.random.default_rng(53)
    base = rng.standard_normal((300, 8)).astype(np.float32)
    snap = str(tmp_path / "ix.ldb")
    wal = str(tmp_path / "ix.log")
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=512,
               log_path=wal)
    ix.add(base[:200])
    ix.save(snap)  # truncates log
    ix.add(base[200:])  # these live only in the log
    del ix  # "crash": no save
    ix2 = Index.load(snap, log_path=wal, extra_capacity=256)
    assert ix2.size == 300
    d, labels = ix2.search(base[250:251], k=1, ef=16)
    assert labels[0, 0] == 250 and d[0, 0] < 1e-3
    ix2.validate().raise_if_failed()


def test_cost_model_sanity():
    c = estimate_search_cost(n=1_000_000, dim=128, m=16, ef=64, batch=256)
    assert 3 < c.expected_levels < 8
    assert c.expected_visited > 64
    assert c.hbm_bytes_per_batch > 0 and c.flops_per_batch > 0
    assert "visited" in c.summary


def test_crash_atomicity_failure_points(tmp_path, rng):
    """Failure-point crash tests (failure_point.h idiom): crash mid-save
    leaves the previous snapshot intact; crash mid-WAL-append leaves a torn
    record that replay discards."""
    from lantern_tpu.utils.failpoints import (
        FailurePointError,
        failure_point_disable_all,
        failure_point_enable,
    )

    base = rng.standard_normal((100, 8)).astype(np.float32)
    snap = str(tmp_path / "a.ldb")
    wal = str(tmp_path / "a.log")
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=256,
               log_path=wal)
    ix.add(base[:50])
    ix.save(snap)
    try:
        # crash during save: old snapshot must survive
        ix.add(base[50:60])
        failure_point_enable("save_snapshot", "before_rename")
        with pytest.raises(FailurePointError):
            ix.save(snap)
        failure_point_disable_all()
        old = Index.load(snap)
        assert old.size == 50  # pre-crash snapshot intact
        # crash mid-WAL-append: torn tail discarded on replay, prefix intact
        failure_point_enable("insert_log_append", "mid_record",
                             dont_trigger_first_nr=5)
        with pytest.raises(FailurePointError):
            ix.add(base[60:70])
        failure_point_disable_all()
        recovered = Index.load(snap, log_path=wal, extra_capacity=64)
        # snapshot(50) + log replay: adds 50..59 complete, 60..64 before the
        # torn record, nothing after
        assert 50 <= recovered.size <= 66
        recovered.validate().raise_if_failed()
    finally:
        failure_point_disable_all()


def test_load_v1_snapshot_fixture():
    """A checked-in HEADER_VERSION=1 snapshot must load (upgrade-on-load) —
    the analog of the reference's sql/updates migration path."""
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "snapshot_v1.ldb")
    ix = load_snapshot(fixture)
    assert ix.n == 50 and ix.p.dim == 16 and ix.p.m == 8
    validate(ix).raise_if_failed()
    # and a facade load works too (log bookkeeping defaults to replay-all)
    ix2 = Index.load(fixture)
    assert ix2.size == 50
    d, labels = ix2.search(np.asarray(ix.vectors[3]), k=1, ef=32)
    assert labels[0, 0] == 3 and d[0, 0] < 1e-4


def test_save_writes_current_header(small_engine, tmp_path):
    from lantern_tpu.storage.snapshot import HEADER_VERSION

    ix, _ = small_engine
    path = str(tmp_path / "cur.ldb")
    save_snapshot(ix, path, log_state=(1234, 7))
    magic, version = struct.unpack("<II", open(path, "rb").read(8))
    assert version == HEADER_VERSION == 3
    _, state = load_snapshot(path, return_log_state=True)
    assert state == (1234, 7)


def test_crash_between_snapshot_and_log_truncate(tmp_path, rng):
    """Crash after the snapshot rename but before the log truncate: replay
    must skip the records the snapshot already folded in (no duplicates)."""
    from lantern_tpu.utils.failpoints import (
        FailurePointError,
        failure_point_disable_all,
        failure_point_enable,
    )

    base = rng.standard_normal((80, 8)).astype(np.float32)
    snap = str(tmp_path / "b.ldb")
    wal = str(tmp_path / "b.log")
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=256,
               log_path=wal)
    ix.add(base)
    try:
        failure_point_enable("index_save", "before_log_truncate")
        with pytest.raises(FailurePointError):
            ix.save(snap)
    finally:
        failure_point_disable_all()
    del ix
    # log still holds all 80 records, but the snapshot's (generation, lsn)
    # marks them as folded: replay must add nothing
    recovered = Index.load(snap, log_path=wal, extra_capacity=64)
    assert recovered.size == 80
    lab = np.asarray(recovered._eng.labels[:80])
    assert len(np.unique(lab)) == 80  # no duplicate-label nodes
    recovered.validate().raise_if_failed()
    # post-recovery appends land in the (adopted) log and replay correctly
    recovered.add(base[:5] + 100.0)
    del recovered
    again = Index.load(snap, log_path=wal, extra_capacity=64)
    assert again.size == 85


def test_compact_reclaims_tombstones(tmp_path):
    """compact() rebuilds without deleted nodes — the reclaim the reference
    lacks (delete.c:24-25 warns tombstones are permanent until REINDEX)."""
    rng = np.random.default_rng(60)
    base = rng.standard_normal((600, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=600)
    ix.add(base)
    dead = np.arange(0, 300, dtype=np.uint64)  # delete half
    assert ix.delete(dead) == 300
    assert ix.num_deleted == 300
    ix.compact()
    assert ix.size == 300 and ix.num_deleted == 0
    ix.validate().raise_if_failed()
    # deleted labels are gone; live labels still found exactly
    q = base[450]
    d, labels = ix.search(q, k=5, ef=64)
    assert labels[0, 0] == 450 and d[0, 0] < 1e-5
    assert not (set(labels[0].tolist()) & set(dead.tolist()))
    # snapshot round-trips the compacted index
    path = str(tmp_path / "compacted.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    assert ix2.size == 300 and ix2.num_deleted == 0
    _, labels2 = ix2.search(q, k=5)
    assert labels2[0, 0] == 450


def test_reindex_changes_params():
    rng = np.random.default_rng(61)
    base = rng.standard_normal((400, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=400)
    ix.add(base)
    import dataclasses

    ix.reindex(dataclasses.replace(ix.params, m=12, ef_construction=64))
    assert ix.params.m == 12 and ix.size == 400
    ix.validate().raise_if_failed()
    d, labels = ix.search(base[7], k=3, ef=64)
    assert labels[0, 0] == 7
    # dim/metric/quant changes are rejected
    with pytest.raises(ValueError, match="compact cannot change"):
        ix.reindex(dataclasses.replace(ix.params, metric=Metric.COS))


def test_compact_incremental_add_after():
    rng = np.random.default_rng(62)
    base = rng.standard_normal((300, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=300)
    ix.add(base)
    ix.delete(np.arange(100, dtype=np.uint64))
    ix.compact()
    extra = rng.standard_normal((50, 16)).astype(np.float32)
    ix.add(extra, labels=np.arange(1000, 1050, dtype=np.uint64))
    assert ix.size == 250
    _, labels = ix.search(extra[0], k=3, ef=64)
    assert labels[0, 0] == 1000


def test_search_with_stats_explain_analog():
    """Index.search(with_stats=True) — masked_explain analog surface."""
    rng = np.random.default_rng(63)
    base = rng.standard_normal((500, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=500)
    ix.add(base)
    d, labels, stats = ix.search(base[:4], k=5, mode="flat", with_stats=True)
    assert stats["mode"] == "flat" and stats["rows_scanned"] == 500
    assert labels[0, 0] == 0
    d, labels, stats = ix.search(base[:4], k=5, mode="graph", ef=48,
                                 with_stats=True)
    assert stats["mode"] == "graph" and stats["ef"] == 48
    assert "visited" in stats or "expanded" in stats
    assert labels[0, 0] == 0


def test_rerank_refuses_misaligned_rows(tmp_path):
    """Regression: after load + add, the captured rerank rows cover only the
    post-load slots; rerank must refuse rather than clamp into wrong rows."""
    rng = np.random.default_rng(64)
    base = rng.standard_normal((300, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=48, pq=True,
                   num_subvectors=8, num_centroids=32)
    ix = Index(p, capacity=300)
    ix.train_pq(base)
    ix.add(base)
    path = str(tmp_path / "pq.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    extra = rng.standard_normal((20, 32)).astype(np.float32)
    ix2.add(extra, labels=np.arange(1000, 1020, dtype=np.uint64))
    with pytest.raises(ValueError, match="slot-aligned"):
        ix2.search(base[0], k=5, rerank=50)
    # supplying the full rows re-arms rerank
    ix2.set_rerank_source(np.concatenate([base, extra]))
    d, labels = ix2.search(base[7], k=5, rerank=50)
    assert labels[0, 0] == 7


def test_insert_log_v1_adoption_mints_generation(tmp_path):
    """Regression: an adopted generation-0 (v1) log reads as 'no state' in
    replay dedup, re-opening the double-replay crash window."""
    import struct as _s
    import zlib as _z

    from lantern_tpu.storage.snapshot import _LOG_MAGIC, _LOG_REC_HDR

    path = str(tmp_path / "v1.log")
    vec = np.arange(4, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(_s.pack("<II", _LOG_MAGIC, 1))  # v1 header: no generation
        raw = vec.tobytes()
        f.write(_s.pack(_LOG_REC_HDR, 7, len(raw), _z.crc32(raw)))
        f.write(raw)
    log = InsertLog(path, 4, np.float32)
    assert log.generation != 0 and log.count == 1
    log.close()
    # the rewritten log still replays its record, and dedup now works
    vecs, labels = InsertLog.replay(path, 4, np.float32)
    np.testing.assert_array_equal(vecs[0], vec)
    assert labels[0] == 7
    vecs2, _ = InsertLog.replay(path, 4, np.float32,
                                snapshot_state=(log.generation, 1))
    assert len(vecs2) == 0  # folded record skipped


def test_insert_log_torn_header_recovers(tmp_path):
    """Regression: a torn log header (crash during header write) made the
    log permanently unopenable (struct.error from __init__/replay)."""
    for nbytes in (3, 11):  # torn before magic completes / before generation
        path = str(tmp_path / f"torn{nbytes}.log")
        full = InsertLog(path, 4, np.float32)
        full.close()
        with open(path, "r+b") as f:
            f.truncate(nbytes)
        # replay tolerates it
        vecs, labels = InsertLog.replay(path, 4, np.float32)
        assert len(vecs) == 0
        # reopening recovers with a fresh generation and accepts appends
        log = InsertLog(path, 4, np.float32)
        assert log.generation != 0
        log.append(np.ones((1, 4), np.float32), np.array([9], np.uint64))
        log.close()
        vecs, labels = InsertLog.replay(path, 4, np.float32)
        assert len(vecs) == 1 and labels[0] == 9


def test_filtered_search():
    """allow/deny label filters on both search paths (predicate-filtered
    search; the reference filters above the index scan in the executor)."""
    rng = np.random.default_rng(65)
    base = rng.standard_normal((600, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=600)
    ix.add(base)
    q = base[10]
    # deny the true nearest neighbor: it must vanish from the results
    for mode in ("flat", "graph"):
        d, labels = ix.search(q, k=5, mode=mode, ef=64,
                              deny_labels=np.array([10], np.uint64))
        assert 10 not in labels[0].tolist(), mode
        assert np.isfinite(d[0]).all(), mode
    # allow-list restricted to 8 labels: every result is from the list
    allow = np.arange(100, 108, dtype=np.uint64)
    d, labels = ix.search(q, k=5, mode="flat", allow_labels=allow)
    got = labels[0][np.isfinite(d[0])]
    assert set(got.tolist()) <= set(allow.tolist())
    assert len(got) == 5
    # flat filtering is exact: results match a brute-force over the subset
    sub = base[100:108]
    want_local = np.argsort(((sub - q) ** 2).sum(1))[:5]
    np.testing.assert_array_equal(got, (100 + want_local).astype(np.uint64))
    # graph path under a narrow filter finds at least some allowed rows
    d, labels = ix.search(q, k=5, mode="graph", ef=200,
                          allow_labels=np.arange(0, 300, dtype=np.uint64))
    got = labels[0][np.isfinite(d[0])]
    assert len(got) > 0 and set(got.tolist()) <= set(range(300))
    # unknown labels in the filter are ignored harmlessly
    d, labels = ix.search(q, k=3, deny_labels=np.array([999999], np.uint64))
    assert labels[0, 0] == 10


def test_snapshot_truncation_always_clean_error(small_engine, tmp_path):
    """Any truncation of a snapshot file raises a clear ValueError (never a
    raw struct.error) — crash-during-copy / partial-download robustness."""
    ix, _ = small_engine
    path = str(tmp_path / "full.ldb")
    save_snapshot(ix, path)
    raw = open(path, "rb").read()
    rng = np.random.default_rng(70)
    cuts = sorted(set(
        [3, 7, 8, 20, len(raw) - 1]
        + [int(x) for x in rng.integers(1, len(raw), size=12)]
    ))
    for cut in cuts:
        p = str(tmp_path / f"cut{cut}.ldb")
        with open(p, "wb") as f:
            f.write(raw[:cut])
        with pytest.raises(ValueError):
            load_snapshot(p)


def test_delete_is_wal_logged(tmp_path):
    """Tombstones set after the last save() survive a crash via the log
    (reference: bulk delete runs under GenericXLog, delete.c:40-70) —
    regression: only inserts were logged, deletes vanished on crash."""
    rng = np.random.default_rng(71)
    base = rng.standard_normal((120, 8)).astype(np.float32)
    log = str(tmp_path / "ix.log")
    snap = str(tmp_path / "ix.ldb")
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=128,
               log_path=log)
    ix.add(base[:100])
    ix.save(snap)
    ix.add(base[100:110], labels=np.arange(100, 110, dtype=np.uint64))
    ix.delete(np.array([5, 105], np.uint64))
    # interleaved: delete then re-use of a different label
    ix.add(base[110:], labels=np.arange(110, 120, dtype=np.uint64))
    del ix  # crash: no save()

    ix2 = Index.load(snap, log_path=log)
    assert ix2.size == 120 and ix2.num_deleted == 2
    d, labels = ix2.search(base[5], k=3, ef=32)
    assert 5 not in labels[0].tolist() and 105 not in labels[0].tolist()
    assert labels.shape == (1, 3)
    d, labels = ix2.search(base[115], k=1, ef=32)
    assert labels[0, 0] == 115
    # a save() folds everything; a fresh load has no log to replay
    ix2.save(snap)
    ix3 = Index.load(snap, log_path=log)
    assert ix3.size == 120 and ix3.num_deleted == 2


def test_log_recovers_before_first_save(tmp_path):
    """Crash before the FIRST save(): the WAL is the only copy of the
    inserts — re-opening Index(log_path=...) must replay it, not adopt the
    count and let the next save() truncate the records away."""
    rng = np.random.default_rng(72)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    log = str(tmp_path / "first.log")
    ix = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=64,
               log_path=log)
    ix.add(base)
    ix.delete(np.array([3], np.uint64))
    del ix  # crash: no snapshot exists

    ix2 = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=64,
                log_path=log)
    assert ix2.size == 40 and ix2.num_deleted == 1
    d, labels = ix2.search(base[5], k=1, ef=16)
    assert labels[0, 0] == 5
    # and the records survive a save+truncate+load cycle
    snap = str(tmp_path / "first.ldb")
    ix2.save(snap)
    ix3 = Index.load(snap, log_path=log)
    assert ix3.size == 40 and ix3.num_deleted == 1


def test_log_future_version_refused(tmp_path):
    import struct as _s

    from lantern_tpu.storage.snapshot import _LOG_MAGIC

    path = str(tmp_path / "v9.log")
    with open(path, "wb") as f:
        f.write(_s.pack("<IIQ", _LOG_MAGIC, 9, 42))
    with pytest.raises(ValueError, match="newer than supported"):
        InsertLog(path, 8)
    with pytest.raises(ValueError, match="newer than supported"):
        InsertLog.replay(path, 8)


def test_validator_survives_out_of_range_slot():
    """The validator must REPORT slot corruption, not crash on it."""
    import copy

    from lantern_tpu.graph.host_build import HostHnsw

    rng = np.random.default_rng(73)
    base = rng.standard_normal((300, 8)).astype(np.float32)
    h = HostHnsw(HnswParams(dim=8, m=4, ef_construction=16), seed=1)
    h.add(base)
    bad = copy.deepcopy(h)
    ups = np.nonzero(bad.levels[: bad.n] >= 1)[0]
    assert len(ups) > 0
    bad.upper_slot[ups[0]] = bad.n_upper + 99  # corrupt: slot out of range
    rep = validate(bad)
    assert not rep.ok
    assert any("out of range" in e for e in rep.errors)

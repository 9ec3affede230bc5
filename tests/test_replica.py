"""Log-follower replica tests — the test_wal.py analog.

The reference proves crash/replica safety with a primary + replica pair and
asserts identical query results, including after DELETEs
(lantern_hnsw/scripts/test_wal.py:8-40). Here: a writer Index appends to its
insert log; an IndexFollower in the same or another process tails it.
"""

import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest

from lantern_tpu.config import HnswParams
from lantern_tpu.index import Index
from lantern_tpu.storage.snapshot import _LOG_REC_HDR

DIM = 24
P = HnswParams(dim=DIM, m=8, ef_construction=48, ef=64)


def _queries(rng, n=8):
    return rng.standard_normal((n, DIM)).astype(np.float32)


def assert_query_parity(writer, follower, queries, k=10, ef=96):
    """Identical results, the way test_wal.py asserts result rows: exact
    (flat) search must match exactly; the graph path must return the same
    label set (both engines replay the same ops in the same order with the
    same level draws, so the graphs agree)."""
    dw, lw = writer.search(queries, k=k, mode="flat")
    df, lf = follower.search(queries, k=k, mode="flat")
    np.testing.assert_array_equal(lw, lf)
    np.testing.assert_allclose(dw, df, rtol=1e-5, atol=1e-5)
    for q in queries[:4]:
        dw, lw = writer.search_cpu(q, k=k, ef=ef)
        df, lf = follower.search_cpu(q, k=k, ef=ef)
        assert set(lw.tolist()) == set(lf.tolist())


def test_follower_catchup_to_parity(tmp_path, rng):
    snap = str(tmp_path / "ix.snap")
    log = str(tmp_path / "ix.log")
    base = rng.standard_normal((300, DIM)).astype(np.float32)
    writer = Index(P, capacity=512, seed=3, log_path=log)
    writer.add(base[:200])
    writer.save(snap)

    follower = Index.follow(snap, log)
    assert follower.size == 200
    qs = _queries(rng)
    assert_query_parity(writer, follower, qs)

    # live tail: writer keeps inserting and deleting WITHOUT saving
    writer.add(base[200:260])
    writer.delete(np.arange(10, 30, dtype=np.uint64))
    applied = follower.catchup()
    assert applied == 60 + 20
    assert follower.size == writer.size == 260
    assert follower.num_deleted == writer.num_deleted == 20
    assert_query_parity(writer, follower, qs)

    # generation flip: writer folds the log into a new snapshot (truncate)
    # and appends more — the follower crosses the flip transparently
    writer.save(snap)
    writer.add(base[260:300])
    follower.catchup()
    assert follower.size == 300
    assert_query_parity(writer, follower, qs)

    # idempotent when nothing changed
    assert follower.catchup() == 0


def test_follower_fast_path_skips_reload(tmp_path, rng):
    """A save() that folds only records the follower already applied must
    not force a snapshot reload (the live-tail fast path)."""
    snap = str(tmp_path / "ix.snap")
    log = str(tmp_path / "ix.log")
    writer = Index(P, capacity=256, seed=3, log_path=log)
    writer.add(rng.standard_normal((50, DIM)).astype(np.float32))
    writer.save(snap)
    follower = Index.follow(snap, log)
    writer.add(rng.standard_normal((30, DIM)).astype(np.float32),
               labels=np.arange(50, 80, dtype=np.uint64))
    assert follower.catchup() == 30
    inner_before = follower._ix
    writer.save(snap)  # folds exactly what the follower has
    writer.add(rng.standard_normal((5, DIM)).astype(np.float32),
               labels=np.arange(80, 85, dtype=np.uint64))
    assert follower.catchup() == 5
    assert follower._ix is inner_before  # no reload happened
    assert follower.size == writer.size == 85


def test_follower_tolerates_torn_tail(tmp_path, rng):
    """A torn (in-flight) record reads as 'not yet'; once the writer's bytes
    complete, the same record applies — no corruption, no skipped records."""
    snap = str(tmp_path / "ix.snap")
    log = str(tmp_path / "ix.log")
    writer = Index(P, capacity=256, seed=3, log_path=log)
    writer.add(rng.standard_normal((40, DIM)).astype(np.float32))
    writer.save(snap)
    follower = Index.follow(snap, log)

    # simulate a writer mid-append: header + half the payload
    vec = rng.standard_normal(DIM).astype(np.float32)
    raw = vec.tobytes()
    rec = struct.pack(_LOG_REC_HDR, 40, len(raw), zlib.crc32(raw)) + raw
    with open(log, "ab") as f:
        f.write(rec[: len(rec) // 2])
        f.flush()
    assert follower.catchup() == 0
    assert follower.size == 40

    with open(log, "ab") as f:  # the "writer" completes the record
        f.write(rec[len(rec) // 2:])
        f.flush()
    assert follower.catchup() == 1
    assert follower.size == 41
    d, lab = follower.search(vec, k=1, mode="flat")
    assert lab[0, 0] == 40 and d[0, 0] < 1e-3  # bf16 scan: ~0 self-distance


def test_follower_no_snapshot_yet(tmp_path, rng):
    """Pre-first-save: the log is the only copy; params= bootstraps."""
    log = str(tmp_path / "ix.log")
    snap = str(tmp_path / "ix.snap")  # never written
    writer = Index(P, capacity=256, seed=3, log_path=log)
    writer.add(rng.standard_normal((25, DIM)).astype(np.float32))
    with pytest.raises(ValueError, match="params"):
        Index.follow(snap, log)
    follower = Index.follow(snap, log, params=P)
    assert follower.size == 25
    assert_query_parity(writer, follower, _queries(rng, 4))


_WRITER_SCRIPT = r"""
import sys

import numpy as np

from lantern_tpu.config import HnswParams
from lantern_tpu.index import Index
from lantern_tpu.utils.failpoints import FailurePointError, failure_point_enable

snap, log = sys.argv[1], sys.argv[2]
rng = np.random.default_rng(0xA47E60DB)
base = rng.standard_normal((300, 24)).astype(np.float32)
p = HnswParams(dim=24, m=8, ef_construction=48, ef=64)
w = Index(p, capacity=512, seed=3, log_path=log)
w.add(base[:200])
w.save(snap)
w.add(base[200:260])
w.delete(np.arange(10, 30, dtype=np.uint64))
# die mid-append, leaving a torn tail (header written, payload missing) —
# the "kill A mid-append" leg of the reference's replica test
failure_point_enable("insert_log_append", "mid_record")
try:
    w.add(base[260:261])
except FailurePointError:
    print("TORN")
    sys.exit(0)
sys.exit(3)
"""


def test_follower_two_process(tmp_path, rng):
    """Process A builds, snapshots, keeps inserting/deleting, and dies
    mid-append; process B (this one) catches up to parity and survives the
    torn tail (scripts/test_wal.py:8-40 + crash leg)."""
    snap = str(tmp_path / "ix.snap")
    log = str(tmp_path / "ix.log")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", _WRITER_SCRIPT, snap, log],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    assert "TORN" in proc.stdout

    follower = Index.follow(snap, log)
    assert follower.size == 260  # 200 snapshot + 60 replayed; torn add absent
    assert follower.num_deleted == 20

    # B's state must equal what A durably acknowledged: rebuild the expected
    # writer state locally (same seed/order => same engine state)
    expect_rng = np.random.default_rng(0xA47E60DB)
    base = expect_rng.standard_normal((300, DIM)).astype(np.float32)
    expected = Index(P, capacity=512, seed=3)
    expected.add(base[:200])
    expected.add(base[200:260])
    expected.delete(np.arange(10, 30, dtype=np.uint64))
    assert_query_parity(expected, follower, _queries(rng))

    # the torn tail does not poison future reads: a recovering writer
    # truncates it and appends; the follower keeps following
    writer = Index.load(snap, log_path=log)
    writer.add(base[260:300])
    follower.catchup()
    assert follower.size == 300
    assert_query_parity(writer, follower, _queries(rng))

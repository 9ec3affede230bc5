"""Flat MXU-scan search path (flat.py) — correctness vs the exact oracle.

The TPU-native fast path (see flat.py docstring): dense rank-equivalent
scoring + top-k. On the CPU test backend approx_max_k falls back to exact,
so these tests pin exact semantics; TPU perf is covered by bench.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lantern_tpu.config import HnswParams, Metric, QuantKind
from lantern_tpu.flat import flat_search, flat_search_graph
from lantern_tpu.index import Index
from lantern_tpu.ops import exact_search


@pytest.mark.parametrize("metric", [Metric.L2SQ, Metric.COS])
@pytest.mark.parametrize("block", [None, 100])  # one-shot and blocked paths
def test_flat_matches_oracle(rng, metric, block):
    base = rng.standard_normal((700, 24)).astype(np.float32)
    q = rng.standard_normal((9, 24)).astype(np.float32)
    nsq = (base * base).sum(1)
    d, ids = flat_search(
        jnp.asarray(base), jnp.asarray(nsq), jnp.asarray(q),
        k=10, metric=int(metric), exact=True, block=block,
    )
    od, oids = exact_search(q, base, k=10, metric=metric)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oids))
    np.testing.assert_allclose(np.asarray(d), np.asarray(od), rtol=2e-4, atol=2e-4)


def test_flat_hamming(rng):
    base = rng.integers(0, 2**32, size=(300, 2), dtype=np.uint32)
    q = base[:5]
    d, ids = flat_search(
        jnp.asarray(base), jnp.zeros(300, jnp.float32), jnp.asarray(q),
        k=3, metric=int(Metric.HAMMING), exact=True, block=64,
    )
    assert (np.asarray(ids)[:, 0] == np.arange(5)).all()
    assert (np.asarray(d)[:, 0] == 0).all()


def test_flat_deleted_mask(rng):
    base = rng.standard_normal((200, 8)).astype(np.float32)
    nsq = (base * base).sum(1)
    deleted = np.zeros(200, bool)
    deleted[7] = True
    d, ids = flat_search(
        jnp.asarray(base), jnp.asarray(nsq), jnp.asarray(base[7:8]),
        k=5, metric=int(Metric.L2SQ), exact=True,
        deleted=jnp.asarray(deleted),
    )
    assert 7 not in np.asarray(ids)[0]


def test_flat_blocked_tail(rng):
    """n not divisible by block exercises the tail merge."""
    base = rng.standard_normal((257, 8)).astype(np.float32)
    q = base[250:252] + 1e-4
    nsq = (base * base).sum(1)
    d, ids = flat_search(
        jnp.asarray(base), jnp.asarray(nsq), jnp.asarray(q),
        k=3, metric=int(Metric.L2SQ), exact=True, block=64,
    )
    assert (np.asarray(ids)[:, 0] == [250, 251]).all()


def test_index_flat_dispatch(rng):
    """Index.search(mode='auto') routes through the flat scan and agrees
    with graph mode on the easy hits; tombstones stay excluded."""
    base = rng.standard_normal((500, 16)).astype(np.float32)
    ix = Index(HnswParams(dim=16, m=8, ef_construction=48), capacity=512)
    ix.add(base)
    d_f, lab_f = ix.search(base[:6], k=5, mode="flat")
    d_a, lab_a = ix.search(base[:6], k=5, mode="auto")
    d_g, lab_g = ix.search(base[:6], k=5, ef=64, mode="graph")
    np.testing.assert_array_equal(lab_f, lab_a)  # auto picked flat
    assert (lab_f[:, 0] == np.arange(6)).all()
    assert (lab_g[:, 0] == np.arange(6)).all()
    ix.delete(np.array([2], np.uint64))
    _, lab = ix.search(base[2:3], k=5, mode="flat")
    assert 2 not in lab[0]


def test_flat_graph_quant_paths(rng):
    """bf16 and i8 stored graphs run through the flat path."""
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.native import NativeHnsw

    base = rng.standard_normal((400, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=32)
    eng = NativeHnsw(p, capacity=400)
    eng.add(base)
    for kwargs in ({"dtype": jnp.bfloat16}, {"quant": QuantKind.I8}):
        g = to_device(eng, **kwargs)
        d, ids, labels = flat_search_graph(g, jnp.asarray(base[:4]), k=3, exact=True)
        assert (np.asarray(ids)[:, 0] == np.arange(4)).all()


@pytest.mark.parametrize("metric", [Metric.L2SQ, Metric.COS])
def test_flat_pq_matches_decoded_oracle(rng, metric):
    """flat_search_pq == exact scan over DECODED vectors (bf16 tolerance)."""
    from lantern_tpu.flat import flat_search_pq
    from lantern_tpu.quant.pq import pq_decode, pq_encode, train_codebook

    base = rng.standard_normal((700, 32)).astype(np.float32)
    q = rng.standard_normal((9, 32)).astype(np.float32)
    cb = train_codebook(base, num_subvectors=8, num_centroids=32, iters=10)
    codes = pq_encode(base, cb)
    decoded = pq_decode(codes, cb)

    d, ids = flat_search_pq(
        jnp.asarray(codes), jnp.asarray(cb.centroids), jnp.asarray(q),
        k=10, metric=int(metric), exact=True,
    )
    od, oids = exact_search(q, decoded, k=10, metric=metric)
    # bf16 decode can flip near-ties; require high agreement + close dists
    agree = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(ids), np.asarray(oids))
    ])
    assert agree >= 0.9, f"pq flat vs decoded oracle agreement {agree}"
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.asarray(od)[:, 0], rtol=5e-2, atol=5e-2
    )


def test_flat_pq_blocked_matches_oneshot(rng):
    """Blocked scan (with tail) returns the same ids as the one-shot path."""
    from lantern_tpu.flat import flat_search_pq
    from lantern_tpu.quant.pq import pq_encode, train_codebook

    base = rng.standard_normal((700, 16)).astype(np.float32)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    cb = train_codebook(base, num_subvectors=4, num_centroids=16, iters=8)
    codes = pq_encode(base, cb)
    d1, i1 = flat_search_pq(jnp.asarray(codes), jnp.asarray(cb.centroids),
                            jnp.asarray(q), k=8, exact=True)
    d2, i2 = flat_search_pq(jnp.asarray(codes), jnp.asarray(cb.centroids),
                            jnp.asarray(q), k=8, exact=True, block=128)
    # identical codes make exact ties; merge order may differ within a tie,
    # so compare the id SETS per row and the distances positionally
    for a, b in zip(np.asarray(i1), np.asarray(i2)):
        assert set(a.tolist()) == set(b.tolist())
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_flat_pq_deleted_and_index_dispatch(rng):
    """Tombstones excluded; Index(pq=True) auto mode routes to flat ADC."""
    from lantern_tpu.costmodel import choose_search_strategy

    assert choose_search_strategy(10_000, 16, 1, quant_is_pq=True) == "flat"

    base = rng.standard_normal((900, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=32, pq=True,
                   num_centroids=32, num_subvectors=8)
    ix = Index(p, capacity=900)
    ix.train_pq(base)
    ix.add(base)
    d, labels = ix.search(base[:6], k=5, mode="flat")
    assert (labels[:, 0] == np.arange(6)).all()  # self is nearest (decoded)
    ix.delete(np.arange(6))
    d2, labels2 = ix.search(base[:6], k=5, mode="flat")
    assert not np.isin(labels2, np.arange(6)).any()


def test_index_pq_rerank_facade(rng):
    """Index.search(rerank=L): ADC shortlist + device rerank (bf16 rows)."""
    from lantern_tpu import HnswParams, Index

    base = rng.standard_normal((1200, 64)).astype(np.float32)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    ix = Index(HnswParams(dim=64, m=8, ef_construction=32, pq=True,
                          num_subvectors=16, num_centroids=32),
               capacity=1200)
    ix.add(base)
    _, oids = exact_search(q, base, k=10)
    d_raw, l_raw = ix.search(q, k=10, mode="flat")
    d_rr, l_rr = ix.search(q, k=10, rerank=100)

    def rec(found):
        return np.mean([len(set(int(x) for x in a) & set(b.tolist())) / 10
                        for a, b in zip(np.asarray(found), np.asarray(oids))])

    assert rec(l_rr) >= rec(l_raw)
    assert rec(l_rr) >= 0.8
    # reranked distances are true l2sq of the returned labels (labels are
    # row ids here), to the bf16 precision of the device rerank copy
    r0 = np.asarray(l_rr)[0].astype(np.int64)
    expect = ((base[r0] - q[0]) ** 2).sum(1)
    np.testing.assert_allclose(d_rr[0], expect, rtol=1e-2, atol=1e-2)
    # deleted rows never come back reranked
    ix.delete(np.arange(20))
    _, l2 = ix.search(q, k=10, rerank=100)
    assert not np.isin(np.asarray(l2), np.arange(20)).any()
    # a loaded snapshot has no raw rows until set_rerank_source
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".ldb") as tf:
        ix.save(tf.name)
        ix2 = Index.load(tf.name)
        with pytest.raises(ValueError, match="rerank source"):
            ix2.search(q, k=10, rerank=50)
        ix2.set_rerank_source(base)
        _, l3 = ix2.search(q, k=10, rerank=100)
        assert rec(l3) >= 0.8


def test_index_rerank_auto_calibration(rng):
    """rerank="auto" sizes the shortlist from measured ADC coverage.

    Data reproduces the pq_960 failure mode at CPU-test scale: few large
    tight clusters + aggressive PQ, so within-cluster ADC ranks are nearly
    random — a fixed shallow shortlist (the naive default) caps recall,
    while the calibrated depth recovers it (VERDICT r4 #5; the reference's
    growing-k re-search is its version of "shortlist too shallow",
    scan.c:240-292).
    """
    from lantern_tpu import HnswParams, Index

    n_clusters, per, dim = 8, 250, 96
    centers = 10.0 * rng.standard_normal((n_clusters, dim)).astype(np.float32)
    base = (np.repeat(centers, per, axis=0)
            + rng.standard_normal((n_clusters * per, dim)).astype(np.float32))
    # heavy quantization: 12 subvectors x 16 centroids over 96 d
    ix = Index(HnswParams(dim=dim, m=8, ef_construction=32, pq=True,
                          num_subvectors=12, num_centroids=16),
               capacity=base.shape[0])
    ix.train_pq(base)
    ix.add(base)

    ladder = (50, 100, 250, 500, 1000)
    info = ix.calibrate_rerank(k=10, sample=128, target=0.98, ladder=ladder)
    covs = [info["coverages"][str(s)] for s in ladder]
    assert covs == sorted(covs), f"coverage not monotone: {covs}"
    # the clusters are ~250 rows of ADC-indistinguishable candidates: a
    # 50-deep shortlist cannot cover the true top-10
    assert info["coverages"]["50"] < 0.98
    assert info["depth"] > 50
    assert info["coverage"] >= 0.9

    # fresh in-cluster queries: auto beats the naive shallow default
    qi = rng.integers(0, n_clusters, size=16)
    q = centers[qi] + rng.standard_normal((16, dim)).astype(np.float32)
    _, oids = exact_search(q, base, k=10)

    def rec(found):
        found = np.asarray(found)
        return np.mean([len(set(int(x) for x in a) & set(b.tolist())) / 10
                        for a, b in zip(found, np.asarray(oids))])

    _, l_auto, stats = ix.search(q, k=10, rerank="auto", with_stats=True)
    assert stats["shortlist"] == info["depth"]
    _, l_naive = ix.search(q, k=10, rerank=50)
    assert rec(l_auto) >= rec(l_naive)
    assert rec(l_auto) >= 0.9, f"auto-depth recall {rec(l_auto)}"


def test_flat_pq_rerank_recovers_recall(rng):
    """PQ shortlist + exact rerank: recall@k ~= exact within the shortlist."""
    from lantern_tpu.flat import flat_search_pq, flat_search_pq_rerank
    from lantern_tpu.quant.pq import pq_encode, train_codebook

    base = rng.standard_normal((1500, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    cb = train_codebook(base, num_subvectors=16, num_centroids=32, iters=8)
    codes = pq_encode(base, cb)
    sq = np.einsum("nd,nd->n", base, base).astype(np.float32)
    od, oids = exact_search(q, base, k=10)
    _, raw_ids = flat_search_pq(jnp.asarray(codes), jnp.asarray(cb.centroids),
                                jnp.asarray(q), k=10)
    d, ids = flat_search_pq_rerank(
        jnp.asarray(codes), jnp.asarray(cb.centroids), jnp.asarray(base),
        jnp.asarray(sq), jnp.asarray(q), k=10, shortlist=100,
    )

    def rec(found):
        found = np.asarray(found)
        return np.mean([len(set(a[a >= 0].tolist()) & set(b.tolist())) / 10
                        for a, b in zip(found, np.asarray(oids))])

    assert rec(ids) >= rec(raw_ids)  # rerank never hurts
    assert rec(ids) >= 0.8
    # reranked distances are TRUE metric distances of the returned ids
    ids0 = np.asarray(ids)[0]
    base0 = base[ids0[ids0 >= 0]]
    expect = ((base0 - q[0]) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(d)[0][: len(expect)], expect,
                               rtol=1e-2, atol=1e-2)

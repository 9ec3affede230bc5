"""BM25 / stemmer / bloom / dotvecs / weighted-search tests (X4-X7, C18)."""

import gzip

import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric
from lantern_tpu.index import Index
from lantern_tpu.io import parse_bvecs, parse_fvecs, parse_ivecs, write_fvecs
from lantern_tpu.text import Bloom, Bm25Index, create_bm25_table, porter_stem, text_to_stem_array
from lantern_tpu.weighted import weighted_search


def test_porter_stem_classics():
    # classic Porter fixtures
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "happy": "happi", "relational": "relat", "conditional": "condit",
        "vietnamization": "vietnam", "predication": "predic",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "revival": "reviv", "allowance": "allow",
        "adjustable": "adjust", "effective": "effect", "probate": "probat",
        "controll": "control", "roll": "roll",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, f"{word}: {porter_stem(word)} != {want}"


def test_text_to_stem_array_stopwords():
    out = text_to_stem_array("The quick brown foxes are running over the lazy dogs")
    assert "the" not in out and "are" not in out
    assert "fox" in out and "run" in out and "dog" in out


def test_bloom_basics():
    b = Bloom.for_items(1000, 0.01)
    items = np.arange(0, 500, dtype=np.uint64)
    b.add(items)
    assert b.contains(items).all()
    absent = np.arange(10_000, 11_000, dtype=np.uint64)
    fp = b.contains(absent).mean()
    assert fp < 0.05, f"false positive rate {fp}"
    # roundtrip
    b2 = Bloom.from_bytes(b.to_bytes())
    assert b2.contains(items).all()


def test_bm25_ranking():
    docs = {
        1: "the cat sat on the mat",
        2: "dogs chase cats in the park",
        3: "tpu accelerators run matrix multiplications fast",
        4: "vector search with hnsw graphs on tpu hardware",
        5: "the mat was sat on by a very large cat repeatedly cat cat",
    }
    ix = create_bm25_table(docs)
    res = ix.search("cat mat", k=3)
    assert res[0][0] in (1, 5)
    top_ids = [r[0] for r in res]
    assert 1 in top_ids and 5 in top_ids
    res = ix.search("tpu", k=2)
    assert {r[0] for r in res} == {3, 4}
    assert ix.search("zebra unicorn", k=2) == []


def test_bm25_approximation_path():
    # force approximation with a tiny threshold: popular term "common"
    docs = {i: f"common word doc{i}" for i in range(50)}
    docs[100] = "rare needle document"
    ix = Bm25Index(approximation_threshold=10).add_documents(docs)
    post = ix.postings[porter_stem("common")]
    assert post.bloom is not None  # popular term got a bloom
    scores = ix.score("common", doc_ids=np.array([0, 1, 100], np.int64))
    assert scores.get(0, 0) > 0 and scores.get(1, 0) > 0
    assert 100 not in scores  # not a member
    res = ix.search("rare needle", k=1)
    assert res[0][0] == 100


def test_dotvecs_roundtrip(tmp_path, rng):
    data = rng.standard_normal((20, 8)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    write_fvecs(path, data)
    back = parse_fvecs(path)
    np.testing.assert_array_equal(back, data)
    assert parse_fvecs(path, count=5).shape == (5, 8)
    # gzip path
    with open(path, "rb") as f:
        raw = f.read()
    gz = str(tmp_path / "x.fvecs.gz")
    with gzip.open(gz, "wb") as f:
        f.write(raw)
    np.testing.assert_array_equal(parse_fvecs(gz), data)
    # ivecs / bvecs
    ints = rng.integers(0, 100, (7, 4)).astype(np.int32)
    buf = b"".join(
        np.int32(4).tobytes() + row.tobytes() for row in ints
    )
    np.testing.assert_array_equal(parse_ivecs(buf), ints)
    bts = rng.integers(0, 255, (6, 16)).astype(np.uint8)
    buf = b"".join(np.int32(16).tobytes() + row.tobytes() for row in bts)
    np.testing.assert_array_equal(parse_bvecs(buf), bts)


def test_weighted_search(rng):
    n = 400
    labels = np.arange(n, dtype=np.uint64)
    col_a = rng.standard_normal((n, 8)).astype(np.float32)
    col_b = rng.standard_normal((n, 12)).astype(np.float32)
    ix_a = Index(HnswParams(dim=8, m=8, ef_construction=32), capacity=n)
    ix_a.add(col_a, labels=labels)
    ix_b = Index(HnswParams(dim=12, m=8, ef_construction=32), capacity=n)
    ix_b.add(col_b, labels=labels)

    target = 123
    d, found = weighted_search(
        [(ix_a, 1.0, col_a[target]), (ix_b, 2.0, col_b[target])], k=5
    )
    assert found[0] == target and d[0] < 1e-3
    assert (np.diff(d) >= -1e-6).all()
    # zero weight = column ignored
    d2, found2 = weighted_search(
        [(ix_a, 1.0, col_a[target]), (ix_b, 0.0, col_b[target])], k=5
    )
    assert found2[0] == target


def test_hybrid_search_rrf(rng):
    """Dense + BM25 reciprocal-rank fusion over a shared label space."""
    from lantern_tpu.config import HnswParams
    from lantern_tpu.index import Index
    from lantern_tpu.text.bm25 import Bm25Index
    from lantern_tpu.weighted import hybrid_search

    docs = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "jax tpu kernels with pallas are fast",
        2: "postgres index access methods and vacuum",
        3: "fox hunting with hounds in the countryside",
        4: "tpu matrix units love large batched matmuls",
    }
    # vectors: doc 1 and 4 are close (tpu topic), others far
    base = rng.standard_normal((5, 16)).astype(np.float32) * 5
    base[4] = base[1] + 0.01
    ix = Index(HnswParams(dim=16, m=4, ef_construction=16), capacity=8)
    ix.add(base, labels=np.arange(5, dtype=np.uint64))
    bm = Bm25Index()
    bm.add_documents(docs)
    # query: vector near doc 1, text about "tpu" -> docs 1 and 4 must lead
    s, labels = hybrid_search(ix, bm, base[1], "tpu kernels", k=3)
    assert set(labels[:2].tolist()) == {1, 4}
    assert s[0] >= s[1] >= s[-1]
    # lexical-only signal still surfaces docs the vector ranking missed
    s, labels = hybrid_search(ix, bm, base[2], "fox", k=5)
    assert {0, 3} <= set(labels.tolist())


def test_weighted_search_excludes_tombstones(rng):
    """A label deleted in one column must not contribute that column's
    distance (LEFT-JOIN-NULL semantics) — regression: rows_for_labels
    resolves tombstoned labels and their stale rows were scored."""
    from lantern_tpu.config import HnswParams
    from lantern_tpu.index import Index

    base = rng.standard_normal((200, 8)).astype(np.float32)
    ix_a = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=200)
    ix_a.add(base)
    ix_b = Index(HnswParams(dim=8, m=4, ef_construction=16), capacity=200)
    ix_b.add(base)
    ix_b.delete(np.array([7], np.uint64))
    d, found = weighted_search(
        [(ix_a, 1.0, base[7]), (ix_b, 1.0, base[7])], k=5, ef=32
    )
    assert 7 not in found.tolist()  # absent in B -> excluded everywhere


def test_weighted_search_hamming_packs_query(rng):
    """Raw float query against a b1/hamming column is sign-packed, not
    value-cast (regression: uint32 cast broadcast/garbage)."""
    from lantern_tpu.config import HnswParams, Metric, QuantKind
    from lantern_tpu.index import Index

    raw = rng.standard_normal((100, 64)).astype(np.float32)
    p = HnswParams(dim=64, m=4, ef_construction=16, metric=Metric.HAMMING,
                   quant=QuantKind.B1)
    ix = Index(p, capacity=100)
    ix.add(raw)  # _preprocess binarizes/packs
    d, found = weighted_search([(ix, 1.0, raw[3])], k=3, ef=32)
    assert found[0] == 3 and d[0] == 0.0


def test_bm25_popular_term_approx_without_candidates():
    """Popular terms are approximated unconditionally (bm25_agg.rs:103-119)
    — regression: the approximation only fired with a candidate set, so
    plain search() looped Python-exact over huge postings."""
    from lantern_tpu.text.bm25 import Bm25Index

    bm = Bm25Index(approximation_threshold=5)
    docs = {i: "filler common words" for i in range(20)}
    docs[3] = "filler common words rare"
    bm.add_documents(docs)
    assert bm.postings["common"].bloom is not None  # popular
    r = dict(bm.search("rare common", k=5))
    assert 3 in r  # rare term still exact; doc 3 leads
    assert r[3] == max(r.values())
    # incremental merges stay vectorized-correct: re-adding bumps fq
    bm.add_documents({50: "common common common"})
    post = bm.postings["common"]
    i = int(np.searchsorted(post.doc_ids, 50))
    assert post.doc_ids[i] == 50 and post.fqs[i] == 3


def test_bm25_u64_labels_and_atomic_save(tmp_path):
    """Doc ids share the u64 label space (hashes >= 2**63 must work), and
    save() is atomic (tmp+fsync+rename)."""
    from lantern_tpu.text.bm25 import Bm25Index

    big = 2**63 + 5
    bm = Bm25Index()
    bm.add_documents({big: "giant hash label", 7: "small label"})
    r = dict(bm.search("giant hash", k=3))
    assert big in r
    path = str(tmp_path / "bm.pkl")
    bm.save(path)
    bm2 = Bm25Index.load(path)
    assert big in dict(bm2.search("giant", k=3))
    # second save over the existing file still round-trips
    bm2.add_documents({9: "another"})
    bm2.save(path)
    assert 9 in dict(Bm25Index.load(path).search("another", k=2))

"""Golden-output tests on a small deterministic dataset.

Mirrors the reference's pg_regress golden-file strategy with its
``small_world`` 8-point 3-d fixture (test/expected/hnsw_select.out:5-19):
tiny deterministic data, byte-stable expected results.
"""

import numpy as np
import pytest

from lantern_tpu import HnswParams, Index, Metric
from lantern_tpu.ops import exact_search

# the reference's small_world: 8 corners of the unit cube, ids 000..111
SMALL_WORLD = {
    "000": [0.0, 0.0, 0.0],
    "001": [0.0, 0.0, 1.0],
    "010": [0.0, 1.0, 0.0],
    "011": [0.0, 1.0, 1.0],
    "100": [1.0, 0.0, 0.0],
    "101": [1.0, 0.0, 1.0],
    "110": [1.0, 1.0, 0.0],
    "111": [1.0, 1.0, 1.0],
}


@pytest.fixture(scope="module")
def small_world_index():
    vecs = np.array(list(SMALL_WORLD.values()), np.float32)
    ix = Index(HnswParams(dim=3, m=4, ef_construction=16), capacity=8, seed=0)
    # labels = binary value of the id string + 1 (0 is the null label)
    labels = np.array([int(k, 2) + 1 for k in SMALL_WORLD], np.uint64)
    ix.add(vecs, labels=labels)
    return ix, vecs


def test_small_world_golden_order(small_world_index):
    """ORDER BY v <-> '{0,0,0}' LIMIT 8 — distances must be the exact
    hamming-weight pattern 0,1,1,1,2,2,2,3 (golden from hnsw_select.out)."""
    ix, vecs = small_world_index
    d, labels = ix.search(np.zeros(3, np.float32), k=8, ef=16)
    np.testing.assert_allclose(d[0], [0, 1, 1, 1, 2, 2, 2, 3], atol=1e-6)
    assert labels[0, 0] == 1  # '000' itself


def test_small_world_each_corner_self(small_world_index):
    ix, vecs = small_world_index
    d, labels = ix.search(vecs, k=1, ef=16)
    np.testing.assert_allclose(d[:, 0], 0, atol=1e-6)
    np.testing.assert_array_equal(
        labels[:, 0], [int(k, 2) + 1 for k in SMALL_WORLD]
    )


def test_small_world_matches_exact(small_world_index):
    ix, vecs = small_world_index
    import jax.numpy as jnp

    q = np.array([[0.1, 0.2, 0.9]], np.float32)
    d_ix, labels = ix.search(q, k=8, ef=16)
    d_ex, ids = exact_search(jnp.asarray(q), jnp.asarray(vecs), k=8)
    np.testing.assert_allclose(d_ix[0], np.asarray(d_ex)[0], rtol=1e-5, atol=1e-5)


def test_small_world_deterministic_across_engines():
    vecs = np.array(list(SMALL_WORLD.values()), np.float32)
    labels = np.array([int(k, 2) + 1 for k in SMALL_WORLD], np.uint64)
    results = []
    for engine in ("native", "python"):
        ix = Index(HnswParams(dim=3, m=4, ef_construction=16), capacity=8,
                   seed=0, engine=engine)
        ix.add(vecs, labels=labels)
        d, got = ix.search(np.zeros(3, np.float32), k=8, ef=16)
        results.append((d.round(6).tolist(), sorted(got[0].tolist())))
    # distances identical; full k=8 result covers every label
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1] == list(range(1, 9))


def test_cosine_golden():
    """cos_dist goldens from the reference's dist-function tests."""
    vecs = np.array([[1, 0], [0, 1], [1, 1], [-1, 0]], np.float32)
    ix = Index(HnswParams(dim=2, m=4, ef_construction=16, metric=Metric.COS),
               capacity=4, seed=0)
    ix.add(vecs, labels=np.array([1, 2, 3, 4], np.uint64))
    d, labels = ix.search(np.array([1.0, 0.0], np.float32), k=4, ef=16)
    np.testing.assert_allclose(
        d[0], [0.0, 1.0 - 1.0 / np.sqrt(2), 1.0, 2.0], atol=1e-6
    )
    assert labels[0].tolist() == [1, 3, 2, 4]

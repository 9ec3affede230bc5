"""Distance kernel parity tests (reference: test/sql/hnsw_dist_func.sql)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import Metric
from lantern_tpu.ops import (
    cos_dist,
    exact_search,
    hamming_dist,
    l2sq_dist,
    pack_bits,
    pairwise_dist,
    unpack_bits,
)


def test_l2sq_known_values():
    # l2sq_dist('{1,0}', '{0,1}') = 2 — matches the SQL test fixture behavior
    assert float(l2sq_dist(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))) == 2.0
    assert float(l2sq_dist(jnp.array([1.0, 1.0]), jnp.array([1.0, 1.0]))) == 0.0


def test_cos_known_values():
    assert float(cos_dist(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))) == pytest.approx(1.0)
    assert float(cos_dist(jnp.array([1.0, 1.0]), jnp.array([2.0, 2.0]))) == pytest.approx(0.0, abs=1e-6)
    assert float(cos_dist(jnp.array([1.0, 0.0]), jnp.array([-1.0, 0.0]))) == pytest.approx(2.0)


def test_hamming_known_values():
    # integer arrays are bit vectors: dist('{0}','{1}')=1, '{0}','{3}'=2
    assert float(hamming_dist(jnp.array([0], jnp.int32), jnp.array([1], jnp.int32))) == 1.0
    assert float(hamming_dist(jnp.array([0], jnp.int32), jnp.array([3], jnp.int32))) == 2.0
    # multi-word
    a = jnp.array([0xFFFFFFFF, 0], jnp.uint32)
    b = jnp.array([0, 0xFFFFFFFF], jnp.uint32)
    assert float(hamming_dist(a, b)) == 64.0


def test_pairwise_matches_naive(rng):
    q = rng.standard_normal((7, 33)).astype(np.float32)
    x = rng.standard_normal((19, 33)).astype(np.float32)
    d_l2 = np.asarray(pairwise_dist(jnp.array(q), jnp.array(x), Metric.L2SQ))
    naive = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    # |q|^2-2qx+|x|^2 formulation trades a little cancellation error for MXU
    # throughput; ~1e-3 relative is expected and irrelevant for ranking.
    np.testing.assert_allclose(d_l2, naive, rtol=5e-3, atol=1e-2)

    d_cos = np.asarray(pairwise_dist(jnp.array(q), jnp.array(x), Metric.COS))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(d_cos, 1 - qn @ xn.T, rtol=1e-4, atol=1e-5)


def test_pairwise_hamming(rng):
    q = rng.integers(0, 2**32, size=(5, 4), dtype=np.uint32)
    x = rng.integers(0, 2**32, size=(9, 4), dtype=np.uint32)
    d = np.asarray(pairwise_dist(jnp.array(q), jnp.array(x), Metric.HAMMING))
    naive = np.zeros((5, 9))
    for i in range(5):
        for j in range(9):
            naive[i, j] = bin(int(q[i, 0]) ^ int(x[j, 0])).count("1") + sum(
                bin(int(q[i, w]) ^ int(x[j, w])).count("1") for w in range(1, 4)
            )
    np.testing.assert_array_equal(d, naive)


def test_exact_search_oracle(rng):
    x = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((11, 16)).astype(np.float32)
    d, ids = exact_search(jnp.array(q), jnp.array(x), k=10, metric=Metric.L2SQ, block=128)
    d, ids = np.asarray(d), np.asarray(ids)
    naive = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expect_ids = np.argsort(naive, axis=1)[:, :10]
    expect_d = np.take_along_axis(naive, expect_ids, axis=1)
    np.testing.assert_allclose(np.sort(d, axis=1), d, atol=0)  # ascending
    np.testing.assert_allclose(d, expect_d, rtol=1e-4, atol=1e-3)
    # ids can differ on ties; compare via distances of chosen ids
    chosen = np.take_along_axis(naive, ids, axis=1)
    np.testing.assert_allclose(chosen, expect_d, rtol=1e-4, atol=1e-3)


def test_exact_search_k_larger_than_n(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    d, ids = exact_search(jnp.array(q), jnp.array(x), k=5, metric=Metric.L2SQ)
    assert d.shape == (2, 5) and ids.shape == (2, 5)
    assert np.asarray(ids).min() >= 0


def test_bit_pack_roundtrip(rng):
    x = (rng.standard_normal((3, 70)) > 0).astype(np.float32)
    packed = pack_bits(jnp.array(x))
    assert packed.shape == (3, 3)
    back = np.asarray(unpack_bits(packed, 70))
    np.testing.assert_array_equal(back, x)

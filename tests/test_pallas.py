"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from lantern_tpu.ops.pallas_kernels import hamming_block, hamming_exact_topk


def _naive_hamming(q, b):
    return np.bitwise_count(
        np.bitwise_xor(q[:, None, :], b[None, :, :])
    ).sum(-1).astype(np.float32)


def test_hamming_block_matches_naive(rng):
    q = rng.integers(0, 2**32, size=(37, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(333, 4), dtype=np.uint32)
    out = np.asarray(
        hamming_block(jnp.asarray(q), jnp.asarray(b), block_q=16,
                      block_n=128, interpret=True)
    )
    np.testing.assert_array_equal(out, _naive_hamming(q, b))


def test_hamming_exact_topk(rng):
    q = rng.integers(0, 2**32, size=(5, 2), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(500, 2), dtype=np.uint32)
    d, ids = hamming_exact_topk(jnp.asarray(q), jnp.asarray(b), k=7,
                                block_n=128, interpret=True)
    d, ids = np.asarray(d), np.asarray(ids)
    naive = _naive_hamming(q, b)
    want_d = np.sort(naive, axis=1)[:, :7]
    np.testing.assert_array_equal(np.sort(d, axis=1), want_d)
    got_d = np.take_along_axis(naive, ids, axis=1)
    np.testing.assert_array_equal(got_d, d)

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


def test_search_with_pallas_path(rng):
    """Full search through the fused Pallas gather (interpret on CPU)."""
    import dataclasses

    from lantern_tpu.config import HnswParams
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.native import NativeHnsw

    base = rng.standard_normal((800, 32)).astype(np.float32)
    ix = NativeHnsw(HnswParams(dim=32, m=8, ef_construction=48), capacity=800, seed=0)
    ix.add(base)
    g = to_device(ix)
    gp = dataclasses.replace(g, use_pallas=True)
    q = jnp.asarray(base[:16])
    d1, i1, _ = search_batched(g, q, k=10, ef=48)
    d2, i2, _ = search_batched(gp, q, k=10, ef=48)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)

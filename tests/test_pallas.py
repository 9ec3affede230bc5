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


def test_pq_decode_mxu_matches_gather(rng):
    """The MXU decode kernel equals the gather decode to bf16 precision."""
    from lantern_tpu.ops.pallas_kernels import codebook_blockdiag, pq_decode_mxu

    s, kc, dsub = 8, 32, 4
    cents = rng.standard_normal((s, kc, dsub)).astype(np.float32)
    codes = rng.integers(0, kc, (501, s)).astype(np.uint8)
    cb_flat = codebook_blockdiag(jnp.asarray(cents))
    dec = np.asarray(
        pq_decode_mxu(jnp.asarray(codes), cb_flat, tile=64, interpret=True)
    ).astype(np.float32)
    ref = np.concatenate([cents[i, codes[:, i]] for i in range(s)], axis=1)
    np.testing.assert_allclose(dec, ref, rtol=2e-2, atol=2e-2)


def test_pq_decode_mxu_grouped(rng):
    """Multi-group path (ng > 1): subspace-group tiling of big codebooks.

    s=24, dsub=40 -> grp=3 (largest divisor with grp*dsub <= 128), ng=8:
    exercises the group-major reshape, per-group codebook slicing, and the
    output re-interleave that the 960-d configs rely on."""
    from lantern_tpu.ops.pallas_kernels import codebook_blockdiag, pq_decode_mxu

    s, kc, dsub = 24, 16, 40
    cents = rng.standard_normal((s, kc, dsub)).astype(np.float32)
    codes = rng.integers(0, kc, (130, s)).astype(np.uint8)
    cb_flat = codebook_blockdiag(jnp.asarray(cents))
    dec = np.asarray(
        pq_decode_mxu(jnp.asarray(codes), cb_flat, tile=64, interpret=True)
    ).astype(np.float32)
    ref = np.concatenate([cents[i, codes[:, i]] for i in range(s)], axis=1)
    np.testing.assert_allclose(dec, ref, rtol=2e-2, atol=2e-2)


def test_pq_decode_hilo_matches_onehot(rng):
    """The hi/lo kernel's contract is BIT-IDENTICAL output to the flat
    one-hot kernel for 8-bit codes (K=256) — assert exact equality
    (ADVICE r3: the contract was only exercised indirectly via one
    golden-recall shape)."""
    from lantern_tpu.ops.pallas_kernels import (
        codebook_blockdiag,
        codebook_hilo,
        pq_decode_mxu,
        pq_decode_mxu_hilo,
    )

    s, kc, dsub = 32, 256, 4
    cents = rng.standard_normal((s, kc, dsub)).astype(np.float32)
    codes = rng.integers(0, kc, (301, s)).astype(np.uint8)
    ref = np.asarray(pq_decode_mxu(
        jnp.asarray(codes), codebook_blockdiag(jnp.asarray(cents)),
        tile=64, interpret=True,
    ))
    got = np.asarray(pq_decode_mxu_hilo(
        jnp.asarray(codes), codebook_hilo(jnp.asarray(cents)),
        tile=64, interpret=True,
    ))
    np.testing.assert_array_equal(got, ref)


def test_pq_decode_hilo_grouped_960d(rng):
    """Grouped hi/lo shape of the 960-d config (S=240, dsub=4 -> the 16/16
    split at grp=8, ng=30): exact equality with the one-hot kernel."""
    from lantern_tpu.ops.pallas_kernels import (
        _hilo_group,
        _hilo_plan,
        codebook_blockdiag,
        codebook_hilo,
        pq_decode_mxu,
        pq_decode_mxu_hilo,
    )

    s, kc, dsub = 240, 256, 4
    assert _hilo_plan(s, dsub) == (16, 16, 8)
    assert _hilo_group(s, dsub) == 8
    cents = rng.standard_normal((s, kc, dsub)).astype(np.float32)
    codes = rng.integers(0, kc, (65, s)).astype(np.uint8)
    ref = np.asarray(pq_decode_mxu(
        jnp.asarray(codes), codebook_blockdiag(jnp.asarray(cents)),
        tile=32, interpret=True,
    ))
    got = np.asarray(pq_decode_mxu_hilo(
        jnp.asarray(codes), codebook_hilo(jnp.asarray(cents)),
        tile=32, interpret=True,
    ))
    np.testing.assert_array_equal(got, ref)


def test_hilo_group_vmem_fallback():
    """At dim >= ~16k no hi/lo group size fits the VMEM codebook budget:
    _hilo_group returns 0 and flat_search_pq must keep the subspace-tiled
    pq_decode_mxu path (ADVICE r3 medium)."""
    from lantern_tpu.ops.pallas_kernels import _hilo_group, codebook_hilo

    # dim = 4096 (e.g. 8-bit codes over large embeddings): grp capped by
    # the 8 MB budget -> 512*g*4096 <= 8 MiB -> g <= 4
    assert _hilo_group(1024, 4) == 4
    # dim = 16384: g <= 1 -> grp 1 still works
    assert _hilo_group(4096, 4) == 1
    # dim = 32768: nothing fits -> 0 (fallback path)
    assert _hilo_group(8192, 4) == 0
    import pytest

    with pytest.raises(ValueError):
        codebook_hilo(jnp.zeros((8192, 256, 4), jnp.float32))


def test_upper_ids_inverts_slots(rng):
    from lantern_tpu.graph.device import upper_ids_from_slots

    slots = np.full(100, -1, np.int32)
    picks = rng.choice(100, 17, replace=False)
    slots[np.sort(picks)] = np.arange(17, dtype=np.int32)
    ids = upper_ids_from_slots(slots, 20)
    assert ids.shape == (20,)
    for sl in range(17):
        assert slots[ids[sl]] == sl
    assert (ids[17:] == -1).all()


def test_search_descent_fallback_matches(rng):
    """upper_ids=None (old graphs) falls back to greedy descent with
    results at least as good as nothing — both paths hit >=0.9 recall."""
    import dataclasses

    from lantern_tpu.config import HnswParams
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.graph.host_build import HostHnsw
    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.ops import exact_search

    base = rng.standard_normal((1500, 24)).astype(np.float32)
    p = HnswParams(dim=24, m=8, ef_construction=64)
    h = HostHnsw(p, capacity=1500, seed=2)
    h.add(base)
    g = to_device(h)
    q = rng.standard_normal((12, 24)).astype(np.float32)
    _, tids = exact_search(jnp.asarray(q), jnp.asarray(base), k=5)

    def rec(ids):
        return np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 5
            for a, b in zip(np.asarray(ids), np.asarray(tids))
        ])

    _, ids_scan, _ = search_batched(g, jnp.asarray(q), k=5, ef=48)
    g_nofast = dataclasses.replace(g, upper_ids=None)
    _, ids_desc, _ = search_batched(g_nofast, jnp.asarray(q), k=5, ef=48)
    assert rec(ids_scan) >= 0.9
    assert rec(ids_desc) >= 0.9

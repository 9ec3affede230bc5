"""Quantization tests: scalar (f16/i8/b1) + PQ codebook/ADC.

Reference analogs: test/sql/hnsw_sq.sql (scalar), hnsw_pq.sql (PQ end-to-end),
product_quantization.c k-means, quantize_vector/dequantize_vector SQL fns.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams, Metric, QuantKind
from lantern_tpu.index import Index
from lantern_tpu.ops import exact_search
from lantern_tpu.quant import (
    PQCodebook,
    dequantize_i8,
    pq_decode,
    pq_encode,
    quantize_i8,
    train_codebook,
)
from lantern_tpu.quant.pq import adc_distances, adc_lut


def _recall_labels(found_labels, true_ids):
    hits = 0
    for f, t in zip(found_labels, true_ids):
        hits += len(set(int(x) for x in f) & set(int(x) for x in t))
    return hits / true_ids.size


def test_i8_roundtrip(rng):
    x = rng.standard_normal((50, 32)).astype(np.float32) * 3
    codes, scales = quantize_i8(jnp.array(x))
    assert np.asarray(codes).dtype == np.int8
    back = np.asarray(dequantize_i8(codes, scales))
    # max error bounded by scale/2 per component
    err = np.abs(back - x)
    bound = np.asarray(scales)[:, None] * 0.5 + 1e-6
    assert (err <= bound).all()


def test_pq_train_encode_decode(rng):
    # clustered data so k-means has real structure
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 5
    x = np.repeat(centers, 50, axis=0) + rng.standard_normal((400, 32)).astype(np.float32) * 0.1
    cb = train_codebook(x, num_subvectors=8, num_centroids=16, iters=20, seed=0)
    assert cb.centroids.shape == (8, 16, 4)
    codes = pq_encode(x, cb)
    assert codes.shape == (400, 8) and codes.dtype == np.uint8
    recon = pq_decode(codes, cb)
    mse = float(np.mean((recon - x) ** 2))
    var = float(np.var(x))
    assert mse < 0.05 * var, f"pq mse {mse} vs var {var}"


def test_adc_matches_decoded_l2(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    cb = train_codebook(x, num_subvectors=4, num_centroids=32, iters=15, seed=1)
    codes = pq_encode(x, cb)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    lut = adc_lut(jnp.array(q), jnp.array(cb.centroids), Metric.L2SQ)
    d_adc = np.asarray(adc_distances(lut, jnp.array(codes)[None].repeat(5, 0).astype(jnp.int32)))
    recon = pq_decode(codes, cb)
    d_exact = ((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d_adc, d_exact, rtol=1e-3, atol=1e-3)


def test_index_i8_end_to_end(rng):
    base = rng.standard_normal((800, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=48, quant=QuantKind.I8)
    ix = Index(p, capacity=800)
    ix.add(base)
    g = ix.device_graph
    assert g.vectors.dtype == jnp.int8 and g.vec_scales is not None
    d, labels = ix.search(base[:16], k=10, ef=64)
    _, true_ids = exact_search(jnp.array(base[:16]), jnp.array(base), k=10)
    rec = _recall_labels(labels, np.asarray(true_ids))
    assert rec >= 0.85, f"i8 recall {rec}"
    assert labels[0, 0] == 0  # self-match survives quantization


def test_index_f16_end_to_end(rng):
    base = rng.standard_normal((600, 24)).astype(np.float32)
    p = HnswParams(dim=24, m=8, ef_construction=48, quant=QuantKind.F16)
    ix = Index(p, capacity=600)
    ix.add(base)
    assert ix.device_graph.vectors.dtype == jnp.bfloat16
    d, labels = ix.search(base[:8], k=10, ef=64)
    _, true_ids = exact_search(jnp.array(base[:8]), jnp.array(base), k=10)
    assert _recall_labels(labels, np.asarray(true_ids)) >= 0.9


def test_index_b1_end_to_end(rng):
    base = rng.standard_normal((500, 64)).astype(np.float32)
    p = HnswParams(dim=64, m=8, ef_construction=48, metric=Metric.HAMMING,
                   quant=QuantKind.B1)
    ix = Index(p, capacity=500)
    ix.add(base)  # auto-binarized
    d, labels = ix.search(base[:4], k=5, ef=32)
    assert d[0, 0] == 0.0  # own sign pattern is distance 0
    with pytest.raises(ValueError, match="B1"):
        HnswParams(dim=8, quant=QuantKind.B1)  # b1 without hamming


def test_index_pq_end_to_end(rng, tmp_path):
    # plain gaussian: clustered data would collapse to near-duplicate codes,
    # which degrades any HNSW (ties break neighborhood diversity) and tests
    # the pathology rather than the machinery
    base = rng.standard_normal((1280, 64)).astype(np.float32)
    p = HnswParams(dim=64, m=8, ef_construction=64, pq=True,
                   num_centroids=64, num_subvectors=16)
    ix = Index(p, capacity=1280)
    ix.train_pq(base[:1000])
    ix.add(base)
    g = ix.device_graph
    assert g.vectors.dtype == jnp.uint8 and g.vectors.shape == (1280, 16)
    assert g.pq_codebook is not None
    d, labels = ix.search(base[:16], k=10, ef=64)
    # the right oracle for the graph-search component: exact scan over the
    # DECODED representation the index stores (quantization loss is the
    # codebook's property, measured separately in test_pq_train_encode_decode)
    decoded = pq_decode(pq_encode(base, ix._codebook), ix._codebook)
    _, true_dec = exact_search(jnp.array(base[:16]), jnp.array(decoded), k=10)
    rec = _recall_labels(labels, np.asarray(true_dec))
    assert rec >= 0.8, f"pq graph recall vs decoded-exact {rec}"
    # and a loose sanity floor vs full-precision ground truth
    _, true_ids = exact_search(jnp.array(base[:16]), jnp.array(base), k=10)
    assert _recall_labels(labels, np.asarray(true_ids)) >= 0.2
    # codebook persists through snapshots
    path = str(tmp_path / "pq.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    assert ix2._codebook is not None
    d2, labels2 = ix2.search(base[:16], k=10, ef=64)
    np.testing.assert_array_equal(labels, labels2)


def test_pq_cos_metric(rng):
    base = rng.standard_normal((600, 32)).astype(np.float32)
    p = HnswParams(dim=32, m=8, ef_construction=48, metric=Metric.COS,
                   pq=True, num_centroids=32, num_subvectors=8)
    ix = Index(p, capacity=600)
    ix.add(base)
    d, labels = ix.search(base[:8], k=10, ef=64)
    _, true_ids = exact_search(jnp.array(base[:8]), jnp.array(base), k=10,
                               metric=Metric.COS)
    assert _recall_labels(labels, np.asarray(true_ids)) >= 0.5
    assert (np.asarray(d)[:, 0] < 0.2).all()  # self-ish matches


def test_pqvec_codecs(rng):
    """pqvec type parity (C13): pack/unpack + quantize/dequantize casts."""
    from lantern_tpu.quant.pq import (
        array_to_pqvec,
        dequantize_vector,
        pqvec_to_array,
        quantize_vector,
        train_codebook,
    )

    data = rng.standard_normal((300, 16)).astype(np.float32)
    cb = train_codebook(data, num_subvectors=4, num_centroids=16, iters=8)
    raw = quantize_vector(data[0], cb)
    codes = pqvec_to_array(raw)
    assert codes.shape == (4,) and codes.dtype == np.uint8
    assert array_to_pqvec(codes) == raw
    rec = dequantize_vector(raw, cb)
    assert rec.shape == (16,)
    assert np.linalg.norm(rec - data[0]) < np.linalg.norm(data[0])
    with pytest.raises(ValueError, match="magic"):
        pqvec_to_array(b"\x00\x00\x04\x00abcd")


def test_adc_big_q_path_equivalent(rng):
    """The scanned (memory-bounded) ADC path must equal the one-shot path."""
    import jax.numpy as jnp

    from lantern_tpu.quant import pq as pq_mod

    q, c, s, k = 8, 6, 4, 16
    lut = jnp.asarray(rng.standard_normal((q, s, k)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, k, size=(q, c)).astype(np.int32))
    codes3 = jnp.broadcast_to(codes[:, :, None], (q, c, s))
    d_small = pq_mod.adc_distances(lut, codes3)

    d_big = pq_mod._adc_distances_scan(lut, codes3)
    np.testing.assert_allclose(np.asarray(d_small), np.asarray(d_big),
                               rtol=2e-2, atol=2e-2)


# ---- OPQ (learned rotation) -------------------------------------------------


def _correlated_data(rng, n=1500, dim=32):
    """Data whose subspace energies are unbalanced + dims correlated — the
    regime where a learned rotation beats plain per-subspace k-means."""
    z = rng.standard_normal((n, dim)).astype(np.float32)
    scales = np.linspace(4.0, 0.1, dim).astype(np.float32)  # anisotropic
    mix = rng.standard_normal((dim, dim)).astype(np.float32)  # correlate dims
    qmix, _ = np.linalg.qr(mix)
    return (z * scales) @ qmix.astype(np.float32)


def test_opq_rotation_is_orthogonal_and_roundtrips(rng):
    x = _correlated_data(rng, n=800, dim=32)
    cb = train_codebook(x, num_subvectors=8, num_centroids=16, iters=10,
                        rotate=True, opq_iters=6)
    assert cb.rotation is not None and cb.rotation.shape == (32, 32)
    eye = cb.rotation @ cb.rotation.T
    np.testing.assert_allclose(eye, np.eye(32), atol=1e-4)
    codes = pq_encode(x, cb)
    recon = pq_decode(codes, cb)  # decoded back to ORIGINAL space
    # reconstruction must approximate the original-space data
    mse = float(np.mean((recon - x) ** 2))
    assert mse < float(np.var(x)), "decode did not return to original space"


def test_opq_beats_plain_pq_on_correlated_data(rng):
    x = _correlated_data(rng)
    plain = train_codebook(x, num_subvectors=8, num_centroids=16, iters=20)
    opq = train_codebook(x, num_subvectors=8, num_centroids=16, iters=20,
                         rotate=True, opq_iters=10)
    mse_plain = float(np.mean((pq_decode(pq_encode(x, plain), plain) - x) ** 2))
    mse_opq = float(np.mean((pq_decode(pq_encode(x, opq), opq) - x) ** 2))
    assert mse_opq < mse_plain * 0.9, (
        f"OPQ mse {mse_opq:.4f} not clearly below plain {mse_plain:.4f}"
    )


def test_opq_flat_search_matches_decoded_oracle(rng):
    """flat_search_pq with a rotation must rank by asymmetric distance to the
    original-space reconstructions (rotation is transparent to callers)."""
    from lantern_tpu.flat import flat_search_pq

    x = _correlated_data(rng, n=600, dim=32)
    cb = train_codebook(x, num_subvectors=8, num_centroids=32, iters=15,
                        rotate=True, opq_iters=8)
    codes = pq_encode(x, cb)
    q = x[:8]
    d, ids = flat_search_pq(
        jnp.asarray(codes), jnp.asarray(cb.centroids), jnp.asarray(q),
        k=5, exact=True, rotation=jnp.asarray(cb.rotation),
    )
    recon = pq_decode(codes, cb)
    d_true = ((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    true_ids = np.argsort(d_true, axis=1)[:, :5]
    # distances match the oracle (bf16 decode tolerance); ids overlap heavily
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.sort(d_true, axis=1)[:, 0], rtol=0.05, atol=0.5
    )
    overlap = np.mean([
        len(set(map(int, a)) & set(map(int, b))) / 5
        for a, b in zip(np.asarray(ids), true_ids)
    ])
    assert overlap >= 0.8, f"opq flat scan id overlap {overlap}"


def test_opq_index_end_to_end_with_snapshot_and_insert(rng, tmp_path):
    x = _correlated_data(rng, n=900, dim=32)
    p = HnswParams(dim=32, m=8, ef_construction=64, pq=True,
                   num_centroids=32, num_subvectors=8)
    ix = Index(p, capacity=900)
    ix.train_pq(x[:800], rotate=True, opq_iters=6)
    assert ix._codebook.rotation is not None
    ix.add(x)
    g = ix.device_graph
    assert g.pq_rotation is not None
    d, labels = ix.search(x[:8], k=10, ef=64)
    decoded = pq_decode(pq_encode(x, ix._codebook), ix._codebook)
    _, true_dec = exact_search(jnp.array(x[:8]), jnp.array(decoded), k=10)
    rec = _recall_labels(labels, np.asarray(true_dec))
    assert rec >= 0.8, f"opq graph recall vs decoded-exact {rec}"
    # rotation persists through snapshots; post-load search is identical
    path = str(tmp_path / "opq.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    assert ix2._codebook.rotation is not None
    np.testing.assert_allclose(ix2._codebook.rotation, ix._codebook.rotation)
    d2, labels2 = ix2.search(x[:8], k=10, ef=64)
    np.testing.assert_array_equal(labels, labels2)
    # device_insert into an OPQ graph keeps codes consistent
    from lantern_tpu.graph.build_device import device_insert

    extra = _correlated_data(rng, n=64, dim=32)
    g2 = device_insert(g, extra, labels=np.arange(2000, 2064, dtype=np.uint64),
                       batch=32, seed=3)
    assert g2.pq_rotation is not None
    codes_tail = np.asarray(g2.vectors)[900:964]
    np.testing.assert_array_equal(codes_tail, pq_encode(extra, ix._codebook))


# ---- chunked/resumable PQ training (codebook.rs:168-278 analog) ---------


def _mse(x, cb):
    from lantern_tpu.quant.pq import pq_decode, pq_encode

    return float(np.mean((pq_decode(pq_encode(x, cb), cb) - x) ** 2))


def test_chunked_training_matches_in_ram(rng):
    """Streamed Lloyd == in-RAM Lloyd quality (the chunk accumulation is
    exact, not mini-batch approximate)."""
    from lantern_tpu.quant.pq import train_codebook, train_codebook_chunked

    x = rng.standard_normal((2048, 32)).astype(np.float32)
    loads = []

    def chunks():
        loads.append(0)
        for i in range(0, len(x), 300):  # uneven chunks incl. short tail
            yield x[i : i + 300]

    cb_chunked = train_codebook_chunked(
        chunks, num_subvectors=8, num_centroids=32, iters=8, seed=0
    )
    cb_ram = train_codebook(x, num_subvectors=8, num_centroids=32, iters=8,
                            seed=0)
    m_chunked, m_ram = _mse(x, cb_chunked), _mse(x, cb_ram)
    assert m_chunked <= m_ram * 1.15, (m_chunked, m_ram)
    assert len(loads) >= 8  # one fresh pass per iteration — streamed


def test_chunked_training_resume_bit_identical(rng, tmp_path):
    """Kill after 3 passes -> resume -> same codebook as an uninterrupted
    run (pass-granular checkpoint, atomic rename)."""
    from lantern_tpu.quant.pq import train_codebook_chunked

    x = rng.standard_normal((1024, 16)).astype(np.float32)

    def chunks():
        for i in range(0, len(x), 200):
            yield x[i : i + 200]

    full = train_codebook_chunked(chunks, 4, 16, iters=6, seed=1)
    st = str(tmp_path / "pqtrain.state")
    # "crash" after 3 passes: run with iters=3, state saved at pass 3
    train_codebook_chunked(chunks, 4, 16, iters=3, seed=1, resume_path=st)
    resumed = train_codebook_chunked(chunks, 4, 16, iters=6, seed=1,
                                     resume_path=st)
    np.testing.assert_array_equal(full.centroids, resumed.centroids)


def test_chunked_training_resume_rejects_mismatched_args(rng, tmp_path):
    from lantern_tpu.quant.pq import train_codebook_chunked

    x = rng.standard_normal((256, 16)).astype(np.float32)

    def chunks():
        yield x

    st = str(tmp_path / "s.state")
    train_codebook_chunked(chunks, 4, 16, iters=1, seed=1, resume_path=st)
    import pytest

    with pytest.raises(ValueError, match="does not match"):
        train_codebook_chunked(chunks, 4, 16, iters=2, seed=2, resume_path=st)


def test_chunked_opq_rotation(rng):
    """rotate=True streams the Procrustes cross-matrix too; the rotation is
    orthogonal and helps on correlated data."""
    from lantern_tpu.quant.pq import train_codebook_chunked

    z = rng.standard_normal((2048, 8)).astype(np.float32)
    mix = rng.standard_normal((8, 32)).astype(np.float32)
    x = (z @ mix).astype(np.float32)  # rank-8 embedded in 32d: correlated

    def chunks():
        for i in range(0, len(x), 512):
            yield x[i : i + 512]

    cb_rot = train_codebook_chunked(chunks, 8, 32, iters=6, seed=0,
                                    rotate=True)
    cb_plain = train_codebook_chunked(chunks, 8, 32, iters=6, seed=0)
    r = cb_rot.rotation
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)
    assert _mse(x, cb_rot) <= _mse(x, cb_plain) * 1.05


def test_chunked_training_from_fvecs(rng, tmp_path):
    """End-to-end: stream an .fvecs.gz file that is never fully loaded."""
    import gzip

    from lantern_tpu.io.dotvecs import iter_fvecs, parse_fvecs, write_fvecs
    from lantern_tpu.quant.pq import train_codebook_chunked

    x = rng.standard_normal((1500, 16)).astype(np.float32)
    raw_path = str(tmp_path / "train.fvecs")
    write_fvecs(raw_path, x)
    gz_path = raw_path + ".gz"
    with open(raw_path, "rb") as f, gzip.open(gz_path, "wb") as g:
        g.write(f.read())
    # the streaming reader reproduces the batch parser exactly
    np.testing.assert_array_equal(
        np.concatenate(list(iter_fvecs(gz_path, 400))), parse_fvecs(gz_path)
    )
    cb = train_codebook_chunked(gz_path, 4, 16, iters=4, seed=0,
                                chunk_rows=400)
    assert _mse(x, cb) < float(np.mean(x**2))  # better than zero codebook

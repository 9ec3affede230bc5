"""Pinned-fixture recall regression tests.

The reference pins SIFT fixtures and asserts recall in CI
(run_all_tests.sh:38-56, test/sql/utils/calculate_recall.sql). The analog
here: a deterministic checked-in 10k x 128d clustered .fvecs fixture
(tests/fixtures/golden_*.fvecs.gz — generated once, committed, zero-egress
environment) with golden recall@10 values for every search path. A drop
of more than GOLDEN_TOL from the pinned value fails CI; improvements are
allowed (the goldens then deserve a bump).
"""

import gzip  # noqa: F401  (fixture format documented: gzip fvecs)
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from lantern_tpu.config import HnswParams
from lantern_tpu.io.dotvecs import parse_fvecs

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

# Golden recall@10 values measured on the virtual 8-device CPU mesh at the
# pinned parameters below (see each test). Regenerate with
# benchmarks/compute_golden.py when intentionally changing an algorithm.
GOLDEN = {
    "host_build": 0.866,       # native engine, m=16 efc=64, ef=64
    "device_build": 0.876,     # build_on_device batch=256, ef=64
    "pq_rerank": 0.779,        # OPQ 16 subvectors, shortlist=100
    "sharded": 0.984,          # 8 shards, native per-shard build, ef=64
    "flat_exact": 1.0,         # exact MXU scan == oracle by construction
}
GOLDEN_TOL = 0.01


@pytest.fixture(scope="module")
def golden_data():
    base = parse_fvecs(str(FIXTURES / "golden_base.fvecs.gz"))
    queries = parse_fvecs(str(FIXTURES / "golden_query.fvecs.gz"))
    assert base.shape == (10000, 128) and queries.shape == (100, 128)
    # exact ground truth (blocked numpy; deterministic)
    gt = np.empty((len(queries), 10), np.int64)
    b_sq = np.einsum("nd,nd->n", base, base)
    for i in range(0, len(queries), 25):
        q = queries[i : i + 25]
        d = b_sq[None, :] - 2.0 * (q @ base.T)
        gt[i : i + 25] = np.argsort(d, axis=1, kind="stable")[:, :10]
    return base, queries, gt


def _recall(found, gt):
    hits = 0
    for f, t in zip(np.asarray(found), gt):
        hits += len(set(int(x) for x in f if x >= 0) & set(map(int, t)))
    return hits / gt.size


def _check(name, rec):
    golden = GOLDEN[name]
    assert rec >= golden - GOLDEN_TOL, (
        f"{name} recall@10 regressed: {rec:.3f} vs golden {golden:.3f} "
        f"(tol {GOLDEN_TOL})"
    )
    # improvements are fine but loudly encourage re-pinning
    if rec > golden + 0.02:
        import warnings

        warnings.warn(
            f"{name} recall {rec:.3f} well above golden {golden:.3f}; "
            "consider bumping the pinned value"
        )


@pytest.fixture(scope="module")
def host_graph(golden_data):
    from lantern_tpu.graph.device import to_device
    from lantern_tpu.native import NativeHnsw

    base, _, _ = golden_data
    p = HnswParams(dim=128, m=16, ef_construction=64)
    eng = NativeHnsw(p, capacity=len(base), seed=0)
    eng.add(base)
    return to_device(eng)


def test_golden_host_build(golden_data, host_graph):
    from lantern_tpu.graph.search import search_batched

    base, queries, gt = golden_data
    _, ids, _ = search_batched(host_graph, jnp.asarray(queries), k=10, ef=64)
    _check("host_build", _recall(ids, gt))


def test_golden_flat_exact(golden_data, host_graph):
    from lantern_tpu.flat import flat_search_graph

    base, queries, gt = golden_data
    _, ids, _ = flat_search_graph(host_graph, jnp.asarray(queries), k=10,
                                  exact=True)
    _check("flat_exact", _recall(ids, gt))


def test_golden_device_build(golden_data):
    from lantern_tpu.graph.build_device import build_on_device
    from lantern_tpu.graph.search import search_batched

    base, queries, gt = golden_data
    p = HnswParams(dim=128, m=16, ef_construction=64)
    g = build_on_device(base, p, batch=256, seed=0)
    _, ids, _ = search_batched(g, jnp.asarray(queries), k=10, ef=64)
    _check("device_build", _recall(ids, gt))


def test_golden_pq_rerank(golden_data, host_graph):
    from lantern_tpu.flat import flat_search_pq_rerank
    from lantern_tpu.quant.pq import pq_encode, train_codebook

    base, queries, gt = golden_data
    cb = train_codebook(base, num_subvectors=16, num_centroids=256,
                        iters=10, seed=0, rotate=True, opq_iters=8)
    codes = pq_encode(base, cb)
    rot = (jnp.asarray(cb.rotation) if cb.rotation is not None else None)
    _, ids = flat_search_pq_rerank(
        jnp.asarray(codes), jnp.asarray(cb.centroids),
        jnp.asarray(base), jnp.asarray(np.einsum("nd,nd->n", base, base)),
        jnp.asarray(queries), k=10, shortlist=100, rotation=rot,
    )
    _check("pq_rerank", _recall(ids, gt))


def test_golden_sharded(golden_data):
    from lantern_tpu.parallel import build_sharded, make_mesh, search_sharded

    base, queries, gt = golden_data
    mesh = make_mesh(n_shards=8)
    p = HnswParams(dim=128, m=16, ef_construction=64)
    ix = build_sharded(base, p, mesh, seed=0)
    _, gids, _ = search_sharded(ix, jnp.asarray(queries), k=10, ef=64)
    _check("sharded", _recall(gids, gt))

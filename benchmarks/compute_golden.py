"""Regenerate the pinned golden recall values for tests/test_recall_golden.py.

Run on the virtual CPU mesh (same environment as CI):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/compute_golden.py

Paste the printed values into GOLDEN in tests/test_recall_golden.py when an
intentional algorithm change shifts recall.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lantern_tpu.config import HnswParams  # noqa: E402
from lantern_tpu.io.dotvecs import parse_fvecs  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def recall(found, gt):
    hits = 0
    for f, t in zip(np.asarray(found), gt):
        hits += len(set(int(x) for x in f if x >= 0) & set(map(int, t)))
    return hits / gt.size


def main():
    base = parse_fvecs(str(FIXTURES / "golden_base.fvecs.gz"))
    queries = parse_fvecs(str(FIXTURES / "golden_query.fvecs.gz"))
    b_sq = np.einsum("nd,nd->n", base, base)
    gt = np.empty((len(queries), 10), np.int64)
    for i in range(0, len(queries), 25):
        q = queries[i : i + 25]
        d = b_sq[None, :] - 2.0 * (q @ base.T)
        gt[i : i + 25] = np.argsort(d, axis=1, kind="stable")[:, :10]
    p = HnswParams(dim=128, m=16, ef_construction=64)
    out = {}

    from lantern_tpu.graph.device import to_device
    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.native import NativeHnsw

    eng = NativeHnsw(p, capacity=len(base), seed=0)
    eng.add(base)
    g = to_device(eng)
    _, ids, _ = search_batched(g, jnp.asarray(queries), k=10, ef=64)
    out["host_build"] = recall(ids, gt)

    from lantern_tpu.flat import flat_search_graph

    _, ids, _ = flat_search_graph(g, jnp.asarray(queries), k=10, exact=True)
    out["flat_exact"] = recall(ids, gt)

    from lantern_tpu.graph.build_device import build_on_device

    gd = build_on_device(base, p, batch=256, seed=0)
    _, ids, _ = search_batched(gd, jnp.asarray(queries), k=10, ef=64)
    out["device_build"] = recall(ids, gt)

    from lantern_tpu.flat import flat_search_pq_rerank
    from lantern_tpu.quant.pq import pq_encode, train_codebook

    cb = train_codebook(base, num_subvectors=16, num_centroids=256,
                        iters=10, seed=0, rotate=True, opq_iters=8)
    codes = pq_encode(base, cb)
    rot = jnp.asarray(cb.rotation) if cb.rotation is not None else None
    _, ids = flat_search_pq_rerank(
        jnp.asarray(codes), jnp.asarray(cb.centroids), jnp.asarray(base),
        jnp.asarray(b_sq), jnp.asarray(queries), k=10, shortlist=100,
        rotation=rot,
    )
    out["pq_rerank"] = recall(ids, gt)

    from lantern_tpu.parallel import build_sharded, make_mesh, search_sharded

    mesh = make_mesh(n_shards=8)
    ix = build_sharded(base, p, mesh, seed=0)
    _, gids, _ = search_sharded(ix, jnp.asarray(queries), k=10, ef=64)
    out["sharded"] = recall(gids, gt)

    for k, v in out.items():
        print(f'    "{k}": {v:.3f},')


if __name__ == "__main__":
    main()

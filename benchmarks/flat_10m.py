"""10M-vector single-chip scale check (BASELINE.md item 5's scale story).

Generates 10M x 128d on device (f32 table 5.1 GB + bf16 search copy 2.6 GB,
both HBM-resident on one v5e-16GB chip), runs the flat MXU scan at k=10 with
exact ground truth on 256 queries, and prints one JSON line. The graph
builder also works at this scale (UPPER_POOL_CAP subsampling keeps round
shapes bounded) but takes ~35 min at ~4.6k inserts/s — run with
FLAT10M_BUILD=1 to include it.

Usage: python benchmarks/flat_10m.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # the package sets a machine-fingerprinted cache dir on import;
    # honor an explicit JAX_CACHE_DIR override only
    if os.environ.get("JAX_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_CACHE_DIR"])
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001
            pass
    from lantern_tpu.flat import flat_search

    # 32 in-jit iterations amortize the fixed ~40 ms tunnel dispatch cost
    n, dim, q, iters = 10_000_000, 128, 1024, 32
    # generate in slabs (one 10M normal() would hold 2 copies transiently)
    slabs = [
        jax.random.normal(jax.random.PRNGKey(i), (n // 10, dim), jnp.bfloat16)
        for i in range(10)
    ]
    base = jnp.concatenate(slabs)
    del slabs
    # f32-accumulating einsum on the bf16 table: an astype(f32) square would
    # materialize two 5.1 GB f32 copies and OOM the 16 GB chip
    sq = jnp.einsum("nd,nd->n", base, base, preferred_element_type=jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(77), (q, dim), jnp.float32)
    qbs = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(100 + i), (q, dim), jnp.float32)
        for i in range(iters)
    ])
    _ = int(jnp.sum(sq))

    @jax.jit
    def timed(vectors, sq, qbs):
        def body(acc, qb):
            d, _ = flat_search(vectors, sq, qb, k=10, recall_target=0.95,
                               block=1 << 19)
            return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
        return jax.lax.scan(body, jnp.float32(0), qbs)[0]

    _ = float(timed(base, sq, qbs))  # compile + warm
    best = float("inf")  # best-of-2: first post-compile run is 2-3x slow
    for rep in range(2):
        t0 = time.perf_counter()
        _ = float(timed(base, sq, qbs + 1e-3 * (rep + 1)))
        best = min(best, time.perf_counter() - t0)
    qps = q * iters / best

    nq = 256
    _, true_ids = flat_search(base, sq, queries[:nq], k=10, exact=True,
                              block=1 << 19)
    _, ids = flat_search(base, sq, queries[:nq], k=10, recall_target=0.95,
                         block=1 << 19)
    true_ids, ids = np.asarray(true_ids), np.asarray(ids)
    rec = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(ids, true_ids)
    ]))

    out = {"n": n, "dim": dim, "flat_qps": round(qps, 1),
           "recall_vs_exact": round(rec, 4),
           "device": str(jax.devices()[0])}
    if os.environ.get("FLAT10M_BUILD") == "1":
        from lantern_tpu.config import HnswParams
        from lantern_tpu.graph.build_device import build_on_device

        t0 = time.perf_counter()
        g = build_on_device(base.astype(jnp.float32),
                            HnswParams(dim=dim), batch=1024, seed=0)
        _ = int(jnp.sum(g.levels))
        out["build_device_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

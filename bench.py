"""Headline benchmark: batched HNSW search QPS on TPU vs native CPU engine.

Methodology (BASELINE.md): the reference publishes no numbers, so the
baseline is the CPU HNSW engine (the same role usearch plays for Lantern)
measured in this very run at identical (M, ef_construction, ef) and equal
recall target. vs_baseline = TPU QPS / CPU QPS (target >= 10x per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    # allow quick local runs: BENCH_N / BENCH_Q / BENCH_EF overrides
    n = int(os.environ.get("BENCH_N", 100_000))
    dim = int(os.environ.get("BENCH_DIM", 128))
    q = int(os.environ.get("BENCH_Q", 1024))
    ef = int(os.environ.get("BENCH_EF", 64))
    efc = int(os.environ.get("BENCH_EFC", 64))
    m = int(os.environ.get("BENCH_M", 16))
    k = 10

    import jax
    import jax.numpy as jnp

    from lantern_tpu.config import HnswParams
    from lantern_tpu.graph import search_batched, to_device
    from lantern_tpu.native import NativeHnsw
    from lantern_tpu.ops import exact_search

    rng = np.random.default_rng(0)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries_np = rng.standard_normal((q, dim)).astype(np.float32)

    params = HnswParams(dim=dim, m=m, ef_construction=efc)
    ix = NativeHnsw(params, capacity=n, seed=0)
    t0 = time.perf_counter()
    ix.add(base, nthreads=0)
    build_s = time.perf_counter() - t0

    # CPU baseline QPS (single query loop, the reference's execution model)
    n_cpu = min(q, 200)
    t0 = time.perf_counter()
    for i in range(n_cpu):
        ix.search(queries_np[i], k=k, ef=ef)
    cpu_qps = n_cpu / (time.perf_counter() - t0)

    # TPU batched QPS
    graph = to_device(ix)
    queries = jnp.asarray(queries_np)
    d, ids, _ = search_batched(graph, queries, k=k, ef=ef)
    jax.block_until_ready(d)  # compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        d, ids, _ = search_batched(graph, queries, k=k, ef=ef)
        jax.block_until_ready(d)
    tpu_qps = q * iters / (time.perf_counter() - t0)

    # recall parity vs exact oracle
    _, true_ids = exact_search(queries[:256], jnp.asarray(base), k=k)
    ids_np, true_np = np.asarray(ids[:256]), np.asarray(true_ids)
    recall = float(
        np.mean(
            [
                len(set(a[a >= 0].tolist()) & set(b.tolist())) / k
                for a, b in zip(ids_np, true_np)
            ]
        )
    )

    print(
        json.dumps(
            {
                "metric": f"hnsw_search_qps_n{n}_d{dim}_m{m}_ef{ef}",
                "value": round(tpu_qps, 1),
                "unit": "QPS",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
                "cpu_qps": round(cpu_qps, 1),
                "recall_at_10": round(recall, 4),
                "build_s": round(build_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()

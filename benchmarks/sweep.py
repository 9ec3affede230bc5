"""Full benchmark sweep over BASELINE.md's five configurations.

1. l2sq, 128d (SIFT-shaped), m=16/efc=128, ef sweep -> recall@10 vs QPS
2. cosine on normalized vectors (GloVe-shaped)
3. hamming over packed binary vectors (b1)
4. PQ-compressed index (GIST-shaped 960d -> here dim//4 subvectors)
5. sharded build+search (the multi-chip path, on whatever mesh exists)

Synthetic data is generated on device (this environment's host<->device
link is slow); for real datasets pass --fvecs/--queries (texmex files).
Writes a JSON results table; run manually, not part of the driver bench.

Usage: python benchmarks/sweep.py [--n 200000] [--out results.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# runnable from anywhere without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_qps(graph, q_batches, k, ef, expand):
    import jax
    import jax.numpy as jnp

    from lantern_tpu.graph.search import search_batched

    @jax.jit
    def run(graph, qbs):
        def body(acc, qb):
            dd, _, _ = search_batched(graph, qb, k=k, ef=ef, expand=expand)
            return acc + jnp.sum(jnp.where(jnp.isfinite(dd), dd, 0)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), qbs)
        return acc

    float(run(graph, q_batches))  # compile+warm
    # best-of-2: the first post-compile execution through the tunnel is
    # often 2-3x slower than steady state (CLAUDE.md)
    dt = float("inf")
    for rep in range(2):
        qb = (q_batches + jnp.float32(1e-3) * (rep + 1)
              if q_batches.dtype != jnp.uint32 else q_batches)
        t0 = time.perf_counter()
        float(run(graph, qb))
        dt = min(dt, time.perf_counter() - t0)
    return q_batches.shape[0] * q_batches.shape[1] / dt


def _recall(graph, queries, true_ids, k, ef, expand):
    import numpy as np

    from lantern_tpu.graph.search import search_batched

    _, ids, _ = search_batched(graph, queries, k=k, ef=ef, expand=expand)
    ids = np.asarray(ids)
    return float(
        np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / k
            for a, b in zip(ids, np.asarray(true_ids))
        ])
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--efs", type=int, nargs="+", default=[32, 64, 128, 256])
    ap.add_argument("--expand", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/results.json")
    ap.add_argument("--fvecs", help="optional real dataset (.fvecs)")
    ap.add_argument("--queries", help="optional real queries (.fvecs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu.config import HnswParams, Metric
    from lantern_tpu.graph.build_device import build_on_device
    from lantern_tpu.ops import exact_search
    from lantern_tpu.ops.pallas_kernels import hamming_exact_topk
    from lantern_tpu.quant.pq import train_codebook
    from lantern_tpu.graph.device import to_device  # noqa: F401

    n, dim, qn, k = args.n, args.dim, args.q, args.k
    results = {"n": n, "dim": dim, "q": qn, "device": str(jax.devices()[0]),
               "configs": {}}

    if args.fvecs:
        from lantern_tpu.io import parse_fvecs

        base_np = parse_fvecs(args.fvecs, count=n).astype(np.float32)
        n, dim = base_np.shape
        base = jnp.asarray(base_np)
        queries = jnp.asarray(parse_fvecs(args.queries, count=qn)) if args.queries \
            else base[:qn]
    else:
        base = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float32)
        queries = jax.random.normal(jax.random.PRNGKey(7), (qn, dim), jnp.float32)

    # >=12 in-jit iterations: each loop dispatch through the tunnel costs a
    # fixed ~40 ms; short scans would report RTT, not device throughput
    ITERS = 12
    q_batches = jnp.stack([
        queries * (1.0 + 1e-4 * i) for i in range(ITERS)
    ])
    rq = queries[:256]

    def ef_sweep(graph, true_ids, tag, metric_qbs=None, rq_override=None):
        rows = []
        rq_eff = rq if rq_override is None else rq_override
        for ef in args.efs:
            qps = _timed_qps(graph, metric_qbs if metric_qbs is not None else q_batches,
                             k, ef, args.expand)
            rec = _recall(graph, rq_eff, true_ids, k, ef, args.expand)
            rows.append({"ef": ef, "qps": round(qps, 1), "recall": round(rec, 4)})
            print(f"[{tag}] ef={ef}: {qps:,.0f} QPS recall={rec:.3f}", flush=True)
        return rows

    # ---- 1. l2sq ----
    p = HnswParams(dim=dim, m=16, ef_construction=128)
    t0 = time.perf_counter()
    g = build_on_device(base, p, batch=1024, seed=0)
    jax.block_until_ready(g.neighbors0)
    build_s = time.perf_counter() - t0
    gs = dataclasses.replace(g, vectors=g.vectors.astype(jnp.bfloat16))
    _, tids = exact_search(rq, g.vectors, k=k)
    results["configs"]["l2sq"] = {
        "build_s": round(build_s, 1),
        "inserts_per_s": round(n / build_s, 1),
        "sweep": ef_sweep(gs, tids, "l2sq"),
    }

    # ---- 2. cosine (normalized) ----
    bn = base / jnp.linalg.norm(base, axis=1, keepdims=True)
    qn_v = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    pc = HnswParams(dim=dim, m=16, ef_construction=128, metric=Metric.COS)
    g = build_on_device(bn, pc, batch=1024, seed=0)
    gs = dataclasses.replace(g, vectors=g.vectors.astype(jnp.bfloat16))
    _, tids = exact_search(qn_v[:256], g.vectors, k=k, metric=Metric.COS)
    qb_cos = jnp.stack([qn_v * (1.0 + 1e-4 * i) for i in range(ITERS)])
    results["configs"]["cosine"] = {
        "sweep": ef_sweep(gs, tids, "cos", qb_cos, rq_override=qn_v[:256])
    }

    # ---- 3. hamming (b1) ----
    from lantern_tpu.config import QuantKind
    from lantern_tpu.graph.host_build import HostHnsw  # noqa: F401
    from lantern_tpu.native import NativeHnsw
    from lantern_tpu.ops import pack_bits

    nh = min(n, 50_000)  # hamming builds on host (device build is l2/cos)
    packed = np.asarray(pack_bits(base[:nh]))
    ph = HnswParams(dim=dim, m=16, ef_construction=64, metric=Metric.HAMMING,
                    quant=QuantKind.B1)
    ixh = NativeHnsw(ph, capacity=nh, seed=0)
    ixh.add(packed)
    gh = to_device(ixh)
    qpk = jnp.asarray(np.asarray(pack_bits(queries)))
    td, tih = hamming_exact_topk(qpk[:256], jnp.asarray(packed), k=k)
    # vary the batch per iteration: a loop-invariant body gets hoisted by
    # XLA and the reading becomes one-execution/N (CLAUDE.md trap)
    qb_h = jnp.stack([
        jnp.bitwise_xor(qpk, jnp.uint32(i)) for i in range(ITERS)
    ])
    results["configs"]["hamming"] = {
        "n": nh,
        "sweep": ef_sweep(gh, tih, "hamming", qb_h, rq_override=qpk[:256]),
    }

    # ---- 4. PQ memory parity ----
    nsub = max(1, dim // 4)
    cb = train_codebook(np.asarray(base[: min(n, 100_000)]), num_subvectors=nsub,
                        num_centroids=256, iters=15)
    from lantern_tpu.quant.pq import pq_decode, pq_encode

    codes = pq_encode(np.asarray(base), cb)
    decoded = jnp.asarray(pq_decode(codes, cb))
    g = build_on_device(decoded, p, batch=1024, seed=0)
    import lantern_tpu.graph.device as dev

    gpq = dataclasses.replace(
        g,
        vectors=jnp.asarray(codes),
        pq_codebook=jnp.asarray(cb.centroids),
        quant=dev.QUANT_PQ,
    )
    _, tids = exact_search(rq, base, k=k)
    mem_f32 = n * dim * 4
    mem_pq = codes.nbytes + cb.centroids.nbytes
    results["configs"]["pq"] = {
        "memory_ratio": round(mem_f32 / mem_pq, 1),
        "sweep": ef_sweep(gpq, tids, "pq"),
    }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

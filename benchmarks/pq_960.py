"""GIST-960-shaped PQ memory-parity benchmark (BASELINE.md item 4).

The reference's PQ story is GIST-960 with a 256-centroid codebook
(lantern_hnsw/test/sql/hnsw_pq.sql, lantern_cli/src/pq/). No egress here,
so the dataset is synthetic clustered 960-d data (PQ recall on pure
gaussian is meaningless at this dimension; clustered data is the realistic
shape). Reports:

- f32/bf16 flat-scan QPS + HBM bytes (the unquantized baseline)
- PQ (240 subvectors x 4 dims, K=256 -> 240 B/vec = 16x compression)
  flat ADC QPS + recall@10 vs exact f32 truth
- the same at 120 subvectors (32x compression)

Prints one JSON line; writes benchmarks/pq_960_result.json when run from
the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _stage(msg):
    print(f"[pq960 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

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
    from lantern_tpu.flat import (flat_search, flat_search_pq,
                                  flat_search_pq_rerank)
    from lantern_tpu.quant.pq import _encode_jit, _train_jit, _train_opq_jit

    # 64 in-jit iterations: each loop dispatch through the tunnel costs a
    # fixed ~40 ms, so short scans report RTT, not device throughput
    n, dim, q, iters = 500_000, 960, 256, 64
    # clustered data: 1024 centers, per-point jitter (device-generated)
    key = jax.random.PRNGKey(0)
    centers = jax.random.normal(key, (1024, dim), jnp.float32)
    assign = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1024)
    base = centers[assign] + 0.35 * jax.random.normal(
        jax.random.PRNGKey(2), (n, dim), jnp.float32
    )
    sq = jnp.einsum("nd,nd->n", base, base, preferred_element_type=jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(7), (q, dim), jnp.float32)
    queries = centers[jax.random.randint(jax.random.PRNGKey(8), (q,), 0, 1024)] \
        + 0.35 * queries
    qbs = jnp.stack([
        queries + 1e-3 * (i + 1) for i in range(iters)
    ])
    _stage("exact ground truth")
    _, true_ids = flat_search(base, sq, queries, k=10, exact=True)
    true_np = np.asarray(true_ids)

    def timed(fn, *arrays):
        # arrays are ARGUMENTS, never closures: a closed-over table becomes
        # a compile-request constant shipped through the remote-compile
        # tunnel (~1 GB at 500k x 960 -> stalls/413s; CLAUDE.md r1 lesson)
        @jax.jit
        def loop(qbs, *arrays):
            def body(acc, qb):
                d = fn(qb, *arrays)
                return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
            return jax.lax.scan(body, jnp.float32(0), qbs)[0]
        _ = float(loop(qbs, *arrays))
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(loop(qbs + 1e-4 * (rep + 1), *arrays))
            best = min(best, time.perf_counter() - t0)
        return q * iters / best

    def recall(ids):
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / 10
            for a, b in zip(ids, true_np)
        ]))

    # NOTE: the one-shot [256, 500k] approx-top-k program at dim 960
    # deterministically hangs this environment's XLA TPU compile (>10 min;
    # the same ops with an argsort interposed, or the blocked-merge path,
    # compile in seconds). Force the blocked path.
    BLK = 1 << 17
    out = {"n": n, "dim": dim, "configs": {}}
    _stage("bf16 scan")
    base_bf = base.astype(jnp.bfloat16)
    out["configs"]["bf16"] = {
        "qps": round(timed(
            lambda qb, b, sn: flat_search(b, sn, qb, k=10, block=BLK)[0],
            base_bf, sq,
        ), 1),
        "recall": recall(flat_search(base_bf, sq, queries, k=10, block=BLK)[1]),
        "bytes_per_vector": dim * 2,
    }
    # rotate=True: OPQ learned rotation (clustered 960-d data is heavily
    # correlated across dims — exactly where the rotation pays; same code
    # bytes, same scan cost + one [q, dim] @ [dim, dim] query rotation)
    use_opq = os.environ.get("PQ960_OPQ", "1") != "0"
    for nsub in (240, 120):
        _stage(f"pq{nsub} train (opq={use_opq})")
        if use_opq:
            cents, rot = _train_opq_jit(base[:100_000], 0, nsub, 256, 10, 8)
        else:
            cents, rot = _train_jit(base[:100_000], 0, nsub, 256, 10), None
        codes = _encode_jit(base, cents, rot)
        _stage(f"pq{nsub} scan")
        out["configs"][f"pq{nsub}"] = {
            "qps": round(timed(
                lambda qb, c, ct: flat_search_pq(c, ct, qb, k=10, block=BLK,
                                                 rotation=rot)[0],
                codes, cents,
            ), 1),
            "recall_vs_f32_truth": recall(
                flat_search_pq(codes, cents, queries, k=10, block=BLK,
                               rotation=rot)[1]
            ),
            "bytes_per_vector": nsub,
            "compression_vs_f32": round(dim * 4 / nsub, 1),
            "opq": use_opq,
        }
        # shortlist depths chosen from the r4 degeneracy diagnosis
        # (benchmarks/pq960_diag.json): exact-ADC coverage of the true
        # 10-NN is pq240 0.987 / pq120 0.833 at S=300 and 1.0 / 1.0 at
        # S=600 — depth is the recall knob here. recall_target stays 0.95:
        # the r4a rt99 legs measured identical recall at ~4x the cost
        # (0.9676 vs 0.9680 at pq240/rerank600 — approx-retention is not
        # the cap), so they were dropped.
        # src="f32" legs rerank on the raw f32 rows instead of the bf16
        # table: consecutive true ranks sit ~0.07 d2 apart (21.5 over
        # ~290 ranks) while bf16 row quantization adds ~O(0.3) d2 noise,
        # so the bf16 rerank source pays a real recall tax at this data
        # shape. Reranking from the f32 rows is exactly the reference's
        # semantics: raw vectors stay in the heap table beside the PQ
        # index (lantern.sql pq columns), so a full-precision rerank
        # source always exists. (Both leg families are scored against
        # HIGHEST-precision exact truth since r4c — the earlier "bf16
        # caps at 0.968" reading mixed in ground-truth matmul noise; see
        # BASELINE.md round 4c and exp_rerank_precision.py.)
        for short, rt, src in (
            (100, 0.95, "bf16"), (300, 0.95, "bf16"), (600, 0.95, "bf16"),
            (300, 0.95, "f32"), (600, 0.95, "f32"),
        ):
            tag = (f"pq{nsub}_rerank{short}"
                   + ("_rt99" if rt > 0.95 else "")
                   + ("_f32src" if src == "f32" else ""))
            rows = base if src == "f32" else base_bf
            _stage(tag)
            out["configs"][tag] = {
                "qps": round(timed(
                    lambda qb, c, ct, b, sn, short=short, rt=rt:
                        flat_search_pq_rerank(
                            c, ct, b, sn, qb, k=10, shortlist=short,
                            recall_target=rt, block=BLK, rotation=rot)[0],
                    codes, cents, rows, sq,
                ), 1),
                "recall": recall(flat_search_pq_rerank(
                    codes, cents, rows, sq, queries, k=10,
                    shortlist=short, recall_target=rt, block=BLK,
                    rotation=rot)[1]),
            }
    # Why raw ADC recall collapses at this data shape (r4 diagnosis, full
    # numbers in benchmarks/pq960_diag.json / exp_pq960_diag.py): with 1024
    # clusters x ~488 points and i.i.d. jitter 0.35 at 960 d, every
    # same-cluster point concentrates at d2 ~216-238 from the query
    # (chi-square concentration: the entire true top-10..300 span is
    # d2 = 21.5), while the PQ quantization noise on the ADC estimate is
    # std 36.9 (pq240) / 30.2 (pq120) — the ranking signal sits BELOW the
    # noise floor, so no codebook can order same-cluster points (OPQ is
    # NOT mis-trained: reconstruction MSE 74.8 at 16x compression is 8.7%
    # of the within-cluster d2). The noisy ordering still CONCENTRATES the
    # true neighbors: exact-ADC shortlist coverage reaches 1.0 at S=600
    # for both codes, which is what the rerank legs harvest.
    out["raw_adc_recall_explanation"] = (
        "data-degenerate within-cluster ranking, not OPQ mis-training: "
        "true d2 gap rank10->300 = 21.5 vs ADC noise std 36.9 (pq240) / "
        "30.2 (pq120); exact-ADC top-600 coverage of true 10-NN = 1.0 "
        "for both — see benchmarks/pq960_diag.json"
    )
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "pq_960_result.json"), "w") as f:
            json.dump(out, f)
    except OSError:
        pass


if __name__ == "__main__":
    main()

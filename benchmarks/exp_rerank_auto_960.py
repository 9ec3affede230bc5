"""960-d evidence for rerank="auto" (VERDICT r4 #5 productization).

Same data class as pq_960.py (500k x 960 clustered, 1024 centers, jitter
0.35, OPQ 240x4): the r4 artifacts showed the DEFAULT-looking rerank300
caps recall at ~0.83-0.96 while depth 600 reaches ~0.97 — a user had to
know BASELINE.md to pick the right depth. Here the facade path measures
ADC shortlist coverage on stored rows (Index.calibrate_rerank) and picks
the depth itself; this script reports what search(rerank="auto") actually
achieves vs exact f32 truth, next to the naive default.

Writes benchmarks/rerank_auto_960_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("RA_N", 500_000))
DIM = 960
NQ = 256


def _stage(msg):
    print(f"[ra960 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.config import HnswParams
    from lantern_tpu.flat import flat_search
    from lantern_tpu.index import Index

    rng = np.random.default_rng(0)
    _stage("host data gen")
    centers = rng.standard_normal((1024, DIM)).astype(np.float32)
    assign = rng.integers(0, 1024, size=N)
    base = centers[assign] + 0.35 * rng.standard_normal((N, DIM)).astype(np.float32)
    qi = rng.integers(0, 1024, size=NQ)
    queries = centers[qi] + 0.35 * rng.standard_normal((NQ, DIM)).astype(np.float32)

    params = HnswParams(dim=DIM, m=8, ef_construction=32, pq=True,
                        num_subvectors=240, num_centroids=256)
    ix = Index(params, capacity=N)
    _stage("train opq")
    ix.train_pq(base[:100_000], rotate=True)
    _stage("device build + encode")
    t0 = time.perf_counter()
    ix.add(base, build="device")
    build_s = time.perf_counter() - t0
    _stage(f"build {build_s:.0f}s; calibrating")

    t0 = time.perf_counter()
    info = ix.calibrate_rerank(k=10, sample=256, target=0.99,
                               ladder=(100, 300, 600, 1200, 2400))
    cal_s = time.perf_counter() - t0
    _stage(f"calibration {cal_s:.0f}s: {info}")

    _stage("exact truth")
    sq = jnp.sum(jnp.asarray(base) ** 2, axis=1)
    _, tids = flat_search(jnp.asarray(base), sq, jnp.asarray(queries), k=10,
                          exact=True)
    true_np = np.asarray(tids)

    def rec(labels):
        labels = np.asarray(labels)
        return float(np.mean([
            len(set(int(x) for x in labels[i]) & set(true_np[i].tolist())) / 10
            for i in range(NQ)]))

    out = {"n": N, "dim": DIM, "build_device_s": round(build_s, 1),
           "calibration_s": round(cal_s, 1), "calibration": info}
    _stage("search auto")
    _, l_auto, st = ix.search(queries, k=10, rerank="auto", with_stats=True)
    out["auto_depth"] = st["shortlist"]
    out["recall_auto"] = round(rec(l_auto), 4)
    _stage("search naive 300")
    _, l_300 = ix.search(queries, k=10, rerank=300)
    out["recall_rerank300"] = round(rec(l_300), 4)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "rerank_auto_960_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

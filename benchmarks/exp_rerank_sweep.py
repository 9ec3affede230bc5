"""Decompose the rerank300 QPS regression (r4): recall_target vs sorted
gather. Variants of flat_search_pq_rerank's two r4 changes on 1M x 128d:

  (rt, sort) in {0.95, 0.99} x {unsorted, sorted}

Sorted-gather is toggled via a monkeypatchable flag for the experiment
only; timing per CLAUDE.md (jitted scan, varied input, best-of-2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import lantern_tpu  # noqa: F401, E402
from lantern_tpu.config import Metric  # noqa: E402
from lantern_tpu.flat import _pad_k, flat_search_pq  # noqa: E402

N = int(os.environ.get("EXP_N", 1 << 20))
Q = int(os.environ.get("EXP_Q", 1024))
S, KC, DSUB = 32, 256, 4
DIM = S * DSUB
ITERS = int(os.environ.get("EXP_ITERS", 16))
SHORT = int(os.environ.get("EXP_SHORT", 300))


def rerank(codes, cents, vectors, queries, k, shortlist, rt, sort_ids):
    _, ids = flat_search_pq(
        codes, cents, queries, k=shortlist, recall_target=rt)
    if sort_ids:
        ids = jax.lax.sort(ids, dimension=1)
    safe = jnp.clip(ids, 0, vectors.shape[0] - 1)
    rows = vectors[safe].astype(jnp.float32)
    qf = queries.astype(jnp.float32)
    dots = jnp.einsum("qd,qld->ql", qf, rows,
                      preferred_element_type=jnp.float32)
    x_sq = jnp.einsum("qld,qld->ql", rows, rows,
                      preferred_element_type=jnp.float32)
    d = jnp.maximum(
        jnp.sum(qf * qf, axis=1)[:, None] - 2.0 * dots + x_sq, 0.0)
    d = jnp.where(ids >= 0, d, jnp.inf)
    s_d, s_i = jax.lax.sort((d, ids), dimension=1, num_keys=1,
                            is_stable=False)
    return _pad_k(jnp.where(jnp.isfinite(s_d[:, :k]), s_d[:, :k], jnp.inf),
                  jnp.where(jnp.isfinite(s_d[:, :k]), s_i[:, :k], -1), k)


def main():
    codes = jax.random.randint(jax.random.PRNGKey(0), (N, S), 0, 256,
                               jnp.uint8)
    cents = jax.random.normal(jax.random.PRNGKey(1), (S, KC, DSUB),
                              jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(2), (Q, DIM), jnp.float32)
    vecs = jax.random.normal(
        jax.random.PRNGKey(3), (N, DIM), jnp.float32).astype(jnp.bfloat16)

    out = {}
    for rt in (0.95, 0.99):
        for sort_ids in (False, True):
            @jax.jit
            def run(codes, queries, vecs, rt=rt, sort_ids=sort_ids):
                def body(acc, i):
                    d, _ = rerank(codes, cents, vecs, queries + 1e-3 * i,
                                  10, SHORT, rt, sort_ids)
                    return acc + jnp.sum(
                        jnp.where(jnp.isfinite(d), d, 0)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(ITERS, dtype=jnp.int32))
                return acc

            _ = float(run(codes, queries, vecs))
            best = float("inf")
            for _i in range(2):
                t0 = time.perf_counter()
                _ = float(run(codes, queries, vecs))
                best = min(best, time.perf_counter() - t0)
            ms = best / ITERS * 1e3
            tag = f"rt{rt}_{'sorted' if sort_ids else 'unsorted'}"
            out[tag] = {"ms_per_batch": round(ms, 2),
                        "qps": round(Q * ITERS / best, 1)}
            print(tag, out[tag], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

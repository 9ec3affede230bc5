"""Measure the 1M flat_pq batch + decode kernel on the real TPU.

Timing discipline per CLAUDE.md: one jitted lax.scan with the input varied
per iteration (codes ^ i / queries + i), >= 48 in-jit iterations, scalar
fetch, best-of-2 after a warm-up execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import lantern_tpu  # noqa: F401, E402  (compile cache)
from lantern_tpu.flat import flat_search_pq, flat_search_pq_rerank  # noqa: E402
from lantern_tpu.ops.pallas_kernels import (  # noqa: E402
    codebook_hilo,
    pq_decode_mxu_hilo,
)

N = int(os.environ.get("EXP_N", 1 << 20))
Q = int(os.environ.get("EXP_Q", 1024))
S, KC, DSUB = 32, 256, 4
DIM = S * DSUB
ITERS = int(os.environ.get("EXP_ITERS", 48))


def timed(run, *args, iters=ITERS):
    _ = float(run(*args))
    best = float("inf")
    for _i in range(2):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, S), 0, 256, jnp.uint8)
    cents = jax.random.normal(jax.random.PRNGKey(1), (S, KC, DSUB),
                              jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(2), (Q, DIM), jnp.float32)
    c1 = codebook_hilo(cents)

    @jax.jit
    def run_decode(codes):
        def body(acc, i):
            dec = pq_decode_mxu_hilo(codes ^ i.astype(codes.dtype), c1)
            return acc + jnp.sum(dec[:, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    @jax.jit
    def run_scan(codes, queries):
        def body(acc, i):
            d, ids = flat_search_pq(codes, cents, queries + 1e-3 * i, k=10)
            return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    vecs = jax.random.normal(
        jax.random.PRNGKey(3), (N, DIM), jnp.float32).astype(jnp.bfloat16)
    sqn = jnp.zeros((N,), jnp.float32)  # rerank recomputes |x|^2 from rows

    @jax.jit
    def run_rerank(codes, queries, vecs, sqn):
        def body(acc, i):
            d, ids = flat_search_pq_rerank(
                codes, cents, vecs, sqn, queries + 1e-3 * i, k=10,
                shortlist=300)
            return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    t_dec = timed(run_decode, codes)
    t_scan = timed(run_scan, codes, queries)
    t_rr = timed(run_rerank, codes, queries, vecs, sqn)
    out = {
        "n": N, "q": Q, "iters": ITERS,
        "decode_ms_per_sweep": round(t_dec * 1e3, 3),
        "flat_pq_ms_per_batch": round(t_scan * 1e3, 3),
        "flat_pq_qps": round(Q / t_scan, 1),
        "rerank300_ms_per_batch": round(t_rr * 1e3, 3),
        "rerank300_qps": round(Q / t_rr, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

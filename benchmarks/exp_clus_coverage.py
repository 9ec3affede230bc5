"""Where do the missing 2.6% of true neighbors RANK under the ADC scorer?

clustered_1m (jitter 0.35) saturates at reranked recall 0.974 from
S=300 on: rerank500 = rerank300 = 0.9738, and neither recall_target
0.99 (~exact reduction) nor an f32 rerank source moves it (0.9742). So
the production ADC scorer's top-500 simply does not CONTAIN 2.6% of the
true 10-NN — the shortlist-depth lever is exhausted at 500 and the open
question is the shape of the rank tail: if the misses sit at rank
~1-2k, a deeper shortlist leg recovers them at linear rerank cost; if
they sit at rank 10k+, the 32 B code is quantization-noise-limited on
this data and the honest fix is a finer code (64 subvectors = 64 B/vec)
or residual refinement.

Method: EXACT rank of every true 10-NN under the production scorer
(bf16 decode kernel + bf16 scoring matmul, the flat_search_pq score) —
rank_i = #{rows with score strictly better} accumulated over a blocked
scan; no top-k anywhere, so the measurement has no reduction error.
Data identical to benchmarks/clustered_1m.py jitter=0.35 (same PRNG
keys), OPQ codebook trained the same way. Writes
benchmarks/clus_coverage_result.json with the rank histogram and
per-query miss concentration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("COV_N", 1_000_000))
DIM = 128
NQ = int(os.environ.get("COV_Q", 256))
K = 10
JITTER = float(os.environ.get("COV_JITTER", 0.35))
N_CENTERS = 4096
BLOCK = 1 << 19


def _stage(msg):
    print(f"[cov {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.flat import flat_search
    from lantern_tpu.ops.pallas_kernels import codebook_hilo, pq_decode_mxu_hilo
    from lantern_tpu.quant.pq import _encode_jit, _train_opq_jit

    # identical data to clustered_1m.py jitter=0.35
    centers = jax.random.normal(jax.random.PRNGKey(0), (N_CENTERS, DIM),
                                jnp.float32)
    assign = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N_CENTERS)
    base = centers[assign] + JITTER * jax.random.normal(
        jax.random.PRNGKey(2), (N, DIM), jnp.float32)
    q_all = 1024
    qassign = jax.random.randint(jax.random.PRNGKey(8), (q_all,), 0, N_CENTERS)
    queries = (centers[qassign] + JITTER * jax.random.normal(
        jax.random.PRNGKey(7), (q_all, DIM), jnp.float32))[:NQ]

    _stage("exact ground truth")
    sq = jnp.einsum("nd,nd->n", base, base,
                    preferred_element_type=jnp.float32)
    _, true_ids = flat_search(base, sq, queries, k=K, exact=True)

    _stage("opq train/encode (same as clustered_1m)")
    cents, rot = _train_opq_jit(base[:100_000], 0, 32, 256, 10, 8)
    codes = _encode_jit(base, cents, rot)

    _stage("rank scan")
    cb = codebook_hilo(cents)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    def ranks_of_true(codes, cb, queries, true_ids, rot):
        qf = jnp.dot(queries.astype(jnp.float32), rot,
                     preferred_element_type=jnp.float32)
        qb = qf.astype(jnp.bfloat16)

        def score(c):  # [B, S] codes -> [NQ, B] score (higher better)
            dec = pq_decode_mxu_hilo(c, cb, interpret=interp)
            x_sq = jnp.sum(dec.astype(jnp.float32) ** 2, axis=1)
            dots = jax.lax.dot_general(
                qb, dec, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 2.0 * dots - x_sq[None, :]

        # score of each true neighbor (same scorer, same precision)
        true_codes = codes[true_ids.reshape(-1)]          # [NQ*K, S]
        dec_t = pq_decode_mxu_hilo(true_codes, cb, interpret=interp)
        xsq_t = jnp.sum(dec_t.astype(jnp.float32) ** 2, axis=1)
        dots_t = jnp.einsum(
            "qd,qkd->qk", qb.astype(jnp.float32),
            dec_t.reshape(NQ, K, DIM).astype(jnp.float32),
            preferred_element_type=jnp.float32)
        s_true = 2.0 * dots_t - xsq_t.reshape(NQ, K)      # [NQ, K]

        nb = codes.shape[0] // BLOCK
        xs = codes[: nb * BLOCK].reshape(nb, BLOCK, codes.shape[1])

        def body(acc, c):
            s = score(c)                                   # [NQ, B]
            # rank contribution: rows scoring strictly better than each true.
            # NOTE: the [NQ, K, BLOCK] compare (~1.3e9 bool at BLOCK=2^19)
            # relies on XLA:TPU fusing the compare into the reduce — this
            # script is TPU-only by construction; on the CPU mesh the
            # materialized intermediate would OOM. Chunk over K if that
            # assumption ever breaks.
            acc = acc + jnp.sum(
                (s[:, None, :] > s_true[:, :, None]).astype(jnp.int32),
                axis=2)
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((NQ, K), jnp.int32), xs)
        tail = codes.shape[0] - nb * BLOCK
        if tail:
            s = score(codes[nb * BLOCK:])
            acc = acc + jnp.sum(
                (s[:, None, :] > s_true[:, :, None]).astype(jnp.int32),
                axis=2)
        return acc

    ranks = np.asarray(ranks_of_true(codes, cb, queries, true_ids, rot))
    _stage("done; aggregating")

    cov = {}
    for s in (100, 300, 500, 1000, 2000, 5000, 10000, 50000, 100000):
        cov[f"coverage@{s}"] = round(float((ranks < s).mean()), 4)
    missed = ranks >= 500
    per_q = missed.sum(axis=1)
    worst = np.sort(ranks[missed])[::-1][:20].tolist()
    out = {
        "n": N, "dim": DIM, "jitter": JITTER, "nq": NQ, "k": K,
        "coverage": cov,
        "missed_at_500_total": int(missed.sum()),
        "queries_with_misses": int((per_q > 0).sum()),
        "max_misses_one_query": int(per_q.max()),
        "miss_rank_percentiles": {
            "p50": int(np.percentile(ranks[missed], 50)) if missed.any() else None,
            "p90": int(np.percentile(ranks[missed], 90)) if missed.any() else None,
            "p99": int(np.percentile(ranks[missed], 99)) if missed.any() else None,
        },
        "worst_20_ranks": [int(x) for x in worst],
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "clus_coverage_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

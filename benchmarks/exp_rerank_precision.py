"""Pin the clustered-1M rerank recall cap on MEASUREMENT precision.

Round-4 finding, in three acts:

1. exp_clus_probe isolated the loss to "inside the rerank stage": rt95
   shortlist coverage 0.9996, full-path recall 0.9742 — and its
   "exact f32 rerank" control measured 1.0.
2. Making the production rerank einsums ACTUALLY exact
   (Precision.HIGHEST — the TPU default matmul bf16-truncates f32
   operands) did NOT move the measured recall: still 0.9742, and an
   elementwise (q-x)^2 rerank (no matmul at all) agreed at 0.9742.
3. Resolution: the GROUND TRUTH was the noisy leg. flat_search
   (exact=True) scored via a default-precision dot_general, so the
   "true" top-10 carried the same ~0.1-d2 bf16 truncation noise as the
   old rerank — the probe's 1.0 was two identically-noised pipelines
   agreeing with each other. Once the rerank became exact it started
   DISAGREEING with the noisy truth at exactly the bf16-noise rate
   (~2.6% of neighbor pairs at jitter 0.35, where consecutive ranks sit
   ~0.03-0.1 d2 apart).

This script measures the decomposition head-on (256 queries, 1M x 128d,
jitter 0.35 — the hardest clustered config):

  truth_default_vs_highest   overlap of default-precision vs HIGHEST
                             "exact" top-10: the bf16-noise rate itself
  prod_vs_highest_truth      shipped flat_search_pq_rerank (HIGHEST
                             rerank einsums) scored against HIGHEST
                             ground truth — the honest recall
  prod_vs_default_truth      same results vs the noisy truth (what r3's
                             clustered artifact actually reported)
  diffsq_vs_highest_truth    matmul-free (q-x)^2 rerank control
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 1_000_000
DIM = 128
NQ = 256
K = 10
JITTER = 0.35
N_CENTERS = 4096


def _stage(msg):
    print(f"[prec {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.flat import flat_search, flat_search_pq, \
        flat_search_pq_rerank
    from lantern_tpu.quant.pq import _encode_jit, _train_opq_jit

    centers = jax.random.normal(jax.random.PRNGKey(0), (N_CENTERS, DIM),
                                jnp.float32)
    assign = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N_CENTERS)
    base = centers[assign] + JITTER * jax.random.normal(
        jax.random.PRNGKey(2), (N, DIM), jnp.float32)
    qassign = jax.random.randint(jax.random.PRNGKey(8), (1024,), 0, N_CENTERS)
    queries = (centers[qassign] + JITTER * jax.random.normal(
        jax.random.PRNGKey(7), (1024, DIM), jnp.float32))[:NQ]

    _stage("ground truth (HIGHEST precision via exact=True) + opq")
    sq = jnp.einsum("nd,nd->n", base, base,
                    preferred_element_type=jnp.float32)
    # after the r4 fix flat_search(exact=True) scores at HIGHEST precision
    _, true_ids = flat_search(base, sq, queries, k=K, exact=True)
    true_np = np.asarray(true_ids)

    _stage("ground truth (default-precision dot, the old noisy truth)")

    @jax.jit
    def noisy_truth(base, sq, queries):
        dots = jax.lax.dot_general(
            queries, base, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.top_k(2.0 * dots - sq[None, :], K)

    _, noisy_ids = noisy_truth(base, sq, queries)

    cents, rot = _train_opq_jit(base[:100_000], 0, 32, 256, 10, 8)
    codes = _encode_jit(base, cents, rot)

    def recall(ids, truth):
        ids = np.asarray(ids)
        return round(float(np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
            for a, b in zip(ids, truth)
        ])), 4)

    out = {"truth_default_vs_highest": recall(noisy_ids, true_np)}
    print(out, file=sys.stderr, flush=True)

    _stage("prod rerank (HIGHEST-precision rerank einsums)")
    # NOTE: the global jax.default_matmul_precision('highest') context was
    # tried first and CRASHES: it leaks into the Pallas hilo decode kernel,
    # whose bf16 jnp.dot then asks Mosaic for contract_precision fp32 on
    # bf16 operands ("Bad lhs type"). The production fix is LOCAL precision
    # on the two rerank einsums in flat_search_pq_rerank.
    _, ids = flat_search_pq_rerank(codes, cents, base, sq, queries, k=K,
                                   shortlist=300, rotation=rot)
    out["prod_vs_highest_truth"] = recall(ids, true_np)
    out["prod_vs_default_truth"] = recall(ids, np.asarray(noisy_ids))
    print(out, file=sys.stderr, flush=True)

    _stage("diffsq control (matmul-free exact rerank)")

    @functools.partial(jax.jit, static_argnames=())
    def rerank_diffsq(short_ids, base, queries):
        safe = jnp.clip(short_ids, 0, base.shape[0] - 1)
        rows = base[safe].astype(jnp.float32)            # [Q, L, d]
        qf = queries.astype(jnp.float32)
        d = jnp.sum((qf[:, None, :] - rows) ** 2, axis=-1)
        d = jnp.where(short_ids >= 0, d, jnp.inf)
        sd, si = jax.lax.sort((d, short_ids), dimension=1, num_keys=1,
                              is_stable=False)
        return sd[:, :K], si[:, :K]

    _, short_ids = flat_search_pq(codes, cents, queries, k=300,
                                  rotation=rot)
    _, ids = rerank_diffsq(short_ids, base, queries)
    out["diffsq_vs_highest_truth"] = recall(ids, true_np)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "rerank_precision_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

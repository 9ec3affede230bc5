"""Diagnose the 960-d raw-ADC recall collapse (VERDICT r3 #3).

Hypothesis (r4): the synthetic clustered data is DEGENERATE for
within-cluster ranking at 960 d. With 1024 clusters x ~488 points and
i.i.d. jitter 0.35, every same-cluster point sits at squared distance
~2*0.35^2*960 ~= 235 from the query with relative spread sqrt(2/960) ~=
4.6% (chi-square concentration): the gap between the 10th and 300th true
neighbor is a few units of d^2, while PQ reconstruction noise on the ADC
estimate (cross-term 2(q-x)·(x-x_hat)) has std of the same order or
larger. Raw ADC therefore cannot resolve the top-10 ordering — not
because OPQ mis-trains, but because the ranking signal is below the
quantization noise floor. Rerank recovers exactly as far as the noisy
ADC ordering concentrates the true neighbors inside the shortlist.

This script measures, for the exact pq_960.py data/config:
  - true-distance order statistics per query: d2 at ranks 1/10/100/300/
    488/1000 (the ranking "signal": gaps between ranks)
  - same-cluster population per query (shortlist coverage bound)
  - PQ reconstruction MSE per vector and the induced ADC error std
    (the "noise"), measured directly as std(adc_d2 - true_d2) over the
    query x top-1000 pairs
  - ADC shortlist coverage: fraction of true 10-NN inside the top-S ADC
    candidates for S in {100, 300, 600, 1000, 2000} — the ceiling on
    rerank-S recall

Writes benchmarks/pq960_diag.json. Reference anchor: PQ exists for the
high-dim memory-parity case (lantern_hnsw/src/hnsw/options.h:14-15,
lantern_hnsw/src/hnsw/product_quantization.c).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _stage(msg):
    print(f"[diag {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.flat import flat_search, flat_search_pq
    from lantern_tpu.quant.pq import _encode_jit, _train_opq_jit

    n, dim, q = 500_000, 960, 256
    n_centers, jitter = 1024, 0.35
    key = jax.random.PRNGKey(0)
    centers = jax.random.normal(key, (n_centers, dim), jnp.float32)
    assign = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, n_centers)
    base = centers[assign] + jitter * jax.random.normal(
        jax.random.PRNGKey(2), (n, dim), jnp.float32)
    sq = jnp.einsum("nd,nd->n", base, base,
                    preferred_element_type=jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(7), (q, dim), jnp.float32)
    qassign = jax.random.randint(jax.random.PRNGKey(8), (q,), 0, n_centers)
    queries = centers[qassign] + jitter * queries
    assign_np = np.asarray(assign)
    qassign_np = np.asarray(qassign)

    out = {"n": n, "dim": dim, "n_centers": n_centers, "jitter": jitter}

    # --- cluster population / shortlist coverage bound -------------------
    counts = np.bincount(assign_np, minlength=n_centers)
    qcluster_pop = counts[qassign_np]
    out["cluster_pop"] = {
        "mean": float(counts.mean()), "min": int(counts.min()),
        "max": int(counts.max()),
        "query_cluster_mean": float(qcluster_pop.mean()),
    }

    # --- true top-1000 distances (blocked exact scan, ids + d2) ----------
    _stage("exact top-1000")
    DEEP = 1000
    BLK = 1 << 17

    @jax.jit
    def exact_deep(b, sn, qb):
        d, i = flat_search(b, sn, qb, k=DEEP, block=BLK, exact=True)
        return d, i

    true_d2, true_ids = exact_deep(base, sq, queries)
    true_d2 = np.asarray(true_d2, np.float64)
    true_ids_np = np.asarray(true_ids)
    ranks = [1, 10, 100, 300, 488, 1000]
    out["true_d2_at_rank"] = {
        str(r): float(np.mean(true_d2[:, r - 1])) for r in ranks}
    out["rank_gap_d2"] = {
        "d10_minus_d1": float(np.mean(true_d2[:, 9] - true_d2[:, 0])),
        "d300_minus_d10": float(np.mean(true_d2[:, 299] - true_d2[:, 9])),
        "d1000_minus_d10": float(np.mean(true_d2[:, 999] - true_d2[:, 9])),
    }
    # fraction of the true top-10 that are same-cluster as the query
    same_cluster_frac = float(np.mean(
        assign_np[true_ids_np[:, :10]] == qassign_np[:, None]))
    out["top10_same_cluster_frac"] = same_cluster_frac

    # --- PQ train/encode (pq240 + pq120, OPQ as in pq_960.py) ------------
    for nsub in (240, 120):
        _stage(f"pq{nsub} train")
        cents, rot = _train_opq_jit(base[:100_000], 0, nsub, 256, 10, 8)
        codes = _encode_jit(base, cents, rot)
        _stage(f"pq{nsub} stats")

        # reconstruction MSE (rotated frame; codes live there)
        samp = 20_000
        cents_np = np.asarray(cents, np.float32)   # [S, K, dsub]
        codes_np = np.asarray(codes)
        dsub = cents_np.shape[2]
        dec = cents_np[np.arange(nsub)[None, :], codes_np[:samp]]
        dec = dec.reshape(samp, dim)
        xrot = np.asarray(
            (base[:samp] @ rot) if rot is not None else base[:samp],
            np.float32)
        mse = float(np.mean(np.sum((dec - xrot) ** 2, axis=1)))
        out[f"pq{nsub}_recon_mse"] = mse

        # production ADC ranking (the shortlist source for rerank)
        _stage(f"pq{nsub} adc over corpus")
        _, adc_ids = flat_search_pq(
            codes, cents, queries, k=2000, block=BLK, exact=True,
            rotation=rot)
        adc_ids_np = np.asarray(adc_ids)

        # ADC estimate at each true-top-1000 pair via host LUT:
        # adc_d2[i,j] = sum_s || qrot_s - c[s, codes[id, s]] ||^2
        qrot = np.asarray(
            (queries @ rot) if rot is not None else queries, np.float32)
        qs = qrot.reshape(q, nsub, dsub)
        dots = np.einsum("qsd,skd->qsk", qs, cents_np)
        c_sq = np.sum(cents_np ** 2, axis=2)          # [S, K]
        q_sq = np.sum(qs ** 2, axis=2)                # [Q, S]
        lut = (q_sq[:, :, None] - 2.0 * dots
               + c_sq[None, :, :]).astype(np.float32)  # [Q, S, K]
        pair_codes = codes_np[true_ids_np]             # [Q, DEEP, S]
        adc_pair = np.empty((q, DEEP), np.float64)
        sidx = np.arange(nsub)[None, :]
        for i in range(q):
            adc_pair[i] = lut[i, sidx, pair_codes[i]].sum(axis=1)
        err = adc_pair - true_d2
        out[f"pq{nsub}_adc_err"] = {
            "mean": float(err.mean()), "std": float(err.std()),
            "std_within_top1000_per_query": float(
                np.mean(err.std(axis=1))),
        }

        # shortlist coverage: true 10-NN inside top-S ADC candidates
        cov = {}
        for S in (100, 300, 600, 1000, 2000):
            hits = [
                len(set(adc_ids_np[i, :S].tolist())
                    & set(true_ids_np[i, :10].tolist())) / 10
                for i in range(q)
            ]
            cov[str(S)] = float(np.mean(hits))
        out[f"pq{nsub}_shortlist_coverage"] = cov
        out[f"pq{nsub}_raw_recall10"] = cov_at_10 = float(np.mean([
            len(set(adc_ids_np[i, :10].tolist())
                & set(true_ids_np[i, :10].tolist())) / 10
            for i in range(q)
        ]))
        _stage(f"pq{nsub}: raw@10={cov_at_10:.3f} cov300={cov['300']:.3f} "
               f"cov1000={cov['1000']:.3f} mse={mse:.1f} "
               f"err_std={out[f'pq{nsub}_adc_err']['std_within_top1000_per_query']:.2f}")

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "pq960_diag.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

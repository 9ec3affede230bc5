"""Isolate the clustered-1M rerank recall cap to a stage, empirically.

exp_clus_coverage measured EXACT rank of every true 10-NN under the
production ADC scorer: all < 300 (coverage@300 = 1.0). Yet the full
rerank path saturates at 0.974 for rt95/rt99/f32-source alike. Probe the
ACTUAL shortlist ids returned by flat_search_pq at k=300 under
rt=0.95 / rt=0.99 / exact=True on identical data: coverage of the true
10-NN in the returned id set isolates whether the loss is the approx
reduction (exact=1.0, rt<1.0), the blocked merge (exact<1.0
contradicting the rank scan), or downstream of the shortlist entirely
(all=1.0 — then the bug is in the rerank leg's recall measurement or
the rerank stage itself).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("PROBE_N", 1_000_000))
DIM = 128
NQ = 256
K = 10
JITTER = 0.35
N_CENTERS = 4096


def _stage(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
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

    _stage("ground truth + opq")
    sq = jnp.einsum("nd,nd->n", base, base,
                    preferred_element_type=jnp.float32)
    _, true_ids = flat_search(base, sq, queries, k=K, exact=True)
    true_np = np.asarray(true_ids)
    cents, rot = _train_opq_jit(base[:100_000], 0, 32, 256, 10, 8)
    codes = _encode_jit(base, cents, rot)

    def cover(ids):
        ids = np.asarray(ids)
        return round(float(np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
            for a, b in zip(ids, true_np)
        ])), 4)

    out = {}
    for tag, kw in (
        ("rt95", dict(recall_target=0.95)),
        ("rt99", dict(recall_target=0.99)),
        ("exact", dict(exact=True)),
    ):
        _stage(f"shortlist {tag}")
        _, ids = flat_search_pq(codes, cents, queries, k=300,
                                rotation=rot, **kw)
        out[f"shortlist300_{tag}_coverage"] = cover(ids)
        print(tag, out[f"shortlist300_{tag}_coverage"], file=sys.stderr,
              flush=True)

    # full rerank path at the same rt for reference
    for tag, kw in (("rt95", dict(recall_target=0.95)),
                    ("exact", dict())):
        _stage(f"rerank300 {tag}")
        if tag == "exact":
            # manual: exact shortlist + f32 rerank (removes every approx)
            _, ids = flat_search_pq(codes, cents, queries, k=300,
                                    rotation=rot, exact=True)
            safe = jnp.clip(ids, 0, base.shape[0] - 1)
            rows = base[safe]
            qf = queries.astype(jnp.float32)
            # HIGHEST precision: this leg is the exact-f32 CONTROL, so it
            # must not share the default matmul's bf16-truncation noise with
            # the candidate legs (CLAUDE.md measurement discipline; without
            # this the control reads ~0.974 vs the HIGHEST-precision truth).
            hp = dict(preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            d = (jnp.sum(qf * qf, 1)[:, None]
                 - 2.0 * jnp.einsum("qd,qld->ql", qf, rows, **hp)
                 + jnp.einsum("qld,qld->ql", rows, rows, **hp))
            d = jnp.where(ids >= 0, d, jnp.inf)
            sd, si = jax.lax.sort((d, ids), dimension=1, num_keys=1)
            out["rerank300_exact_f32_recall"] = cover(si[:, :K])
        else:
            _, ids = flat_search_pq_rerank(codes, cents, base, sq, queries,
                                           k=K, shortlist=300,
                                           rotation=rot, **kw)
            out[f"rerank300_{tag}_recall"] = cover(ids)
        print(tag, out, file=sys.stderr, flush=True)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "clus_probe_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

"""Steady-state incremental-insert probe at 1M (VERDICT r4 #2's probe, at
the scale this box can measure end-to-end).

Builds the standard 1M graph (flat candidates, warm cache), then inserts
16k fresh rows through device_insert with candidates="beam" — the trickle
-insert mode huge live indexes use (an O(n) flat scan per 1k-row round
would dominate) — twice: the first pays the grown-shape compiles, the
second is the steady-state number. With the r5 build-beam path (planned
upper_ids -> dense entry scan + 16 seeds) this is the per-insert cost the
10M bar extrapolates from.

Writes benchmarks/insert_probe_1m_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.config import HnswParams
    from lantern_tpu.graph.build_device import build_on_device, device_insert
    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.flat import flat_search

    n, dim, probe = 1_000_000, 128, 16384
    params = HnswParams(dim=dim, m=16, ef_construction=128)
    base = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float32)
    t0 = time.perf_counter()
    g = build_on_device(base, params, batch=1024, seed=0)
    _ = int(jnp.sum(g.levels))
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.0f}s", file=sys.stderr, flush=True)

    out = {"n": n, "dim": dim, "probe_rows": probe,
           "build_1m_s": round(build_s, 1)}
    rows1 = np.asarray(jax.random.normal(jax.random.PRNGKey(21),
                                         (probe, dim), jnp.float32))
    rows2 = np.asarray(jax.random.normal(jax.random.PRNGKey(22),
                                         (probe, dim), jnp.float32))
    t0 = time.perf_counter()
    g = device_insert(g, rows1, batch=1024, seed=5, candidates="beam")
    _ = int(jnp.sum(g.levels))
    cold = time.perf_counter() - t0
    out["insert_beam_cold_s"] = round(cold, 1)
    print(f"insert cold {cold:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    g = device_insert(g, rows2, batch=1024, seed=6, candidates="beam")
    _ = int(jnp.sum(g.levels))
    warm = time.perf_counter() - t0
    out["insert_beam_warm_s"] = round(warm, 1)
    out["insert_beam_warm_inserts_per_s"] = round(probe / warm, 1)
    out["insert_beam_warm_ms_per_round"] = round(warm / (probe / 1024) * 1e3, 1)
    print(f"insert warm {warm:.1f}s = {probe / warm:.0f}/s",
          file=sys.stderr, flush=True)

    # sanity: the inserted rows are findable (self-query recall@1)
    q = jnp.asarray(rows2[:256])
    d, ids, labs = search_batched(g, q, k=1, ef=64, seeds=16)
    from lantern_tpu.graph.device import join_labels
    found = join_labels(np.asarray(labs))[:, 0]
    expect = np.arange(n + probe, n + probe + 256)
    out["self_recall_at1"] = round(float((found == expect).mean()), 4)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "insert_probe_1m_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

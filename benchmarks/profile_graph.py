"""Profile the batched graph beam search at scale on the real TPU.

Builds a graph with the device builder (compile-cached shapes), then traces
one warm batched search and prints the per-source-line device cost table.

Env: PROF_N (default 1_000_000), PROF_Q (1024), PROF_EF (64), PROF_EXPAND (2).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("PROF_N", 1_000_000))
Q = int(os.environ.get("PROF_Q", 1024))
EF = int(os.environ.get("PROF_EF", 64))
EXPAND = int(os.environ.get("PROF_EXPAND", 2))
TRACE_DIR = os.environ.get("PROF_DIR", "/tmp/prof_graph")


def parse_by_line(trace_dir: str, denom: float, top: int = 25):
    import glob
    import gzip
    import json

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev = {k for k, v in tid_names.items() if "XLA Ops" in v}
    agg: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in dev:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.startswith("while"):
            continue
        src = (e.get("args") or {}).get("source", "(none)")
        a = agg.setdefault(src, [0.0, 0])
        a[0] += float(e.get("dur", 0))
        a[1] += 1
    tot = sum(v[0] for v in agg.values())
    print(f"leaf device total {tot/1e3:.0f} ms -> {tot/denom/1e3:.2f} ms/unit")
    for src, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{dur/denom/1e3:8.3f} ms/unit {cnt:7d}x  {src[-75:]}")


def main():
    import jax
    import jax.numpy as jnp

    from lantern_tpu.config import HnswParams
    from lantern_tpu.graph.build_device import build_on_device
    from lantern_tpu.graph.search import search_batched

    dim = 128
    params = HnswParams(dim=dim, m=16, ef_construction=128)
    base = jax.random.normal(jax.random.PRNGKey(0), (N, dim), jnp.float32)
    t0 = time.perf_counter()
    g = build_on_device(base, params, batch=1024, seed=0)
    _ = int(jnp.sum(g.levels))
    print(f"build: {time.perf_counter()-t0:.0f}s", flush=True)
    import dataclasses
    g = dataclasses.replace(g, vectors=g.vectors.astype(jnp.bfloat16))

    iters = 4
    qb = jax.random.normal(jax.random.PRNGKey(7), (iters, Q, dim), jnp.float32)

    @jax.jit
    def timed(g, qbs):
        def body(acc, q):
            d, i, lab = search_batched(g, q, k=10, ef=EF, expand=EXPAND)
            return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), qbs)
        return acc

    _ = float(timed(g, qb))
    best = 1e9
    for t in range(2):
        t0 = time.perf_counter()
        _ = float(timed(g, qb + 1e-3))
        best = min(best, time.perf_counter() - t0)
    print(f"search ef={EF}: {best/iters*1e3:.1f} ms/batch "
          f"({Q*iters/best:.0f} QPS)", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        _ = float(timed(g, qb + 2e-3))
    parse_by_line(TRACE_DIR, denom=iters)


if __name__ == "__main__":
    main()

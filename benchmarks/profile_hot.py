"""Profile the hot device paths at 1M scale and print a per-fusion cost table.

Targets (pick with PROF_TARGET=build|pq|graph|flat, default build):
  build: one warm insert_rounds group (16 rounds x batch) against a 1M-cap
         BuildState — the steady-state cost of the device builder.
  pq:    flat_search_pq over 1M x 32-subvector codes.
  flat:  flat_search over 1M f32/bf16.
  graph: search_batched at ef=64 over a small random graph (structure only).

Methodology per CLAUDE.md: jax.profiler.trace around ONE jitted dispatch
(warmed first), then parse trace.json.gz directly and aggregate device-side
op durations by fusion name. tensorboard is unavailable here.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("PROF_N", 1_000_000))
BATCH = int(os.environ.get("PROF_BATCH", 1024))
Q = int(os.environ.get("PROF_Q", 256))
TARGET = os.environ.get("PROF_TARGET", "build")
TRACE_DIR = os.environ.get("PROF_DIR", "/tmp/prof_hot")
# build-target knobs: vector-table dtype, built-prefix position, pool kind
STORE = os.environ.get("PROF_STORE", "f32")  # f32 | bf16
PREFIX = int(os.environ.get("PROF_PREFIX", 0))  # 0 -> N//2
FLATCAND = os.environ.get("PROF_FLATCAND", "1") != "0"  # 0 -> beam pools


def parse_trace(trace_dir: str, top: int = 25):
    """Aggregate device-lane op durations from the newest trace.json.gz."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device XLA Ops
    dev_tids = set()
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    for (pid, tid), name in tid_names.items():
        pname = pid_names.get(pid, "")
        if "XLA Ops" in name or ("TPU" in pname and "Steps" not in name):
            dev_tids.add((pid, tid))
    agg: dict[str, list[float]] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in dev_tids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"\n== device op time (total {total/1e3:.1f} ms across lanes) ==")
    for name, (dur, cnt) in rows:
        print(f"{dur/1e3:9.2f} ms  {cnt:5d}x  {100*dur/max(total,1e-9):5.1f}%  {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp

    import lantern_tpu  # noqa: F401  (enables compile cache)

    key = jax.random.PRNGKey(0)
    dim = 128

    if TARGET == "build":
        from lantern_tpu.config import HnswParams
        from lantern_tpu.graph import build_device as bd

        params = HnswParams(dim=dim, m=16, ef_construction=128)
        m = params.m
        vdt = jnp.bfloat16 if STORE == "bf16" else jnp.float32
        vecs = jax.random.normal(key, (N, dim), vdt)
        rng = np.random.default_rng(0)
        u = np.maximum(rng.random(N), 1e-300)
        levels = np.minimum(
            (-np.log(u) * params.level_lambda).astype(np.int64), bd.LMAX
        ).astype(np.int32)
        has_upper = levels >= 1
        upper_slot = np.full(N, -1, np.int32)
        upper_slot[has_upper] = np.arange(int(has_upper.sum()), dtype=np.int32)
        ucap = int(has_upper.sum()) + 1
        sq = jnp.einsum("nd,nd->n", vecs, vecs,
                        preferred_element_type=jnp.float32)
        prefix = PREFIX or N // 2
        # beam pools traverse the adjacency: fill the built prefix with
        # random in-prefix neighbors so the traversal's gather pattern is
        # representative (uniform random rows — the worst/typical case)
        nbr0 = np.full((N + 1, 2 * m), -1, np.int32)
        nbr0[:prefix] = rng.integers(0, prefix, (prefix, 2 * m), dtype=np.int32)
        st = bd.BuildState(
            vectors=vecs,
            sq_norms=sq,
            neighbors0=jnp.asarray(nbr0),
            upper_neighbors=jnp.full((ucap, bd.LMAX, m), -1, jnp.int32),
            upper_slot=jnp.asarray(upper_slot),
            levels=jnp.asarray(levels),
            entry=jnp.asarray(0, jnp.int32),
            max_level=jnp.asarray(int(levels.max()), jnp.int32),
            n=jnp.asarray(prefix, jnp.int32),  # built prefix: real masked work
            m=m, dim=dim, metric=int(params.metric),
        )
        level_id_arrays = []
        for lvl in range(1, bd.LMAX + 1):
            lids = np.nonzero(levels >= lvl)[0].astype(np.int32)
            if len(lids) == 0:
                break
            if len(lids) > 32768:
                lids = np.sort(rng.choice(lids, 32768, replace=False))
            size = max(8, 1 << int(np.ceil(np.log2(len(lids)))))
            padded = np.full(size, -1, np.int32)
            padded[: len(lids)] = lids
            level_id_arrays.append(jnp.asarray(padded))
        level_tuple = tuple(level_id_arrays)
        ids2d = jnp.arange(
            prefix, prefix + 16 * BATCH, dtype=jnp.int32
        ).reshape(16, BATCH)
        run = lambda s: bd.insert_rounds(  # noqa: E731
            s, ids2d, level_tuple, params.ef_construction, max(4, m // 2),
            FLATCAND,
        )
        print(f"store={STORE} prefix={prefix} flat_cand={FLATCAND}",
              flush=True)
        print("warming (compile)...", flush=True)
        t0 = time.perf_counter()
        st2 = run(st)
        _ = int(jnp.sum(st2.levels[: 16 * BATCH]))
        print(f"warm dispatch+compile: {time.perf_counter()-t0:.1f}s", flush=True)
        st = st2
        with jax.profiler.trace(TRACE_DIR):
            t0 = time.perf_counter()
            st3 = run(st)
            _ = int(jnp.sum(st3.levels[: 16 * BATCH]))
            wall = time.perf_counter() - t0
        print(f"16 rounds x {BATCH}: {wall:.3f}s = {wall/16*1e3:.1f} ms/round "
              f"({16*BATCH/wall:.0f} inserts/s)")
    elif TARGET in ("pq", "flat", "rerank"):
        from lantern_tpu.flat import (
            flat_search,
            flat_search_pq,
            flat_search_pq_rerank,
        )

        if TARGET == "pq":
            s, kc, dsub = 32, 256, dim // 32
            codes = jax.random.randint(key, (N, s), 0, 256, jnp.uint8)
            cents = jax.random.normal(jax.random.PRNGKey(1), (s, kc, dsub))
            queries = jax.random.normal(jax.random.PRNGKey(2), (Q, dim))
            run = lambda qs: flat_search_pq(codes, cents, qs, k=10)  # noqa: E731
        elif TARGET == "rerank":
            # the production two-stage path (VERDICT r3 #2 bar: rerank300
            # >= 60k QPS at 1M): ADC shortlist=300 + on-device bf16 rerank
            s, kc, dsub = 32, 256, dim // 32
            short = int(os.environ.get("PROF_SHORT", 300))
            codes = jax.random.randint(key, (N, s), 0, 256, jnp.uint8)
            cents = jax.random.normal(jax.random.PRNGKey(1), (s, kc, dsub))
            vecs = jax.random.normal(jax.random.PRNGKey(3), (N, dim),
                                     jnp.bfloat16)
            sq = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
            queries = jax.random.normal(jax.random.PRNGKey(2), (Q, dim))
            run = lambda qs: flat_search_pq_rerank(  # noqa: E731
                codes, cents, vecs, sq, qs, k=10, shortlist=short)
        else:
            vecs = jax.random.normal(key, (N, dim), jnp.bfloat16)
            sq = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=1)
            queries = jax.random.normal(jax.random.PRNGKey(2), (Q, dim))
            run = lambda qs: flat_search(vecs, sq, qs, k=10)  # noqa: E731
        print("warming (compile)...", flush=True)
        d, i = run(queries)
        _ = float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
        with jax.profiler.trace(TRACE_DIR):
            t0 = time.perf_counter()
            d, i = run(queries + 1e-3)
            _ = float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
            wall = time.perf_counter() - t0
        print(f"{TARGET} scan {N}x{dim} Q={Q}: {wall*1e3:.1f} ms = {Q/wall:.0f} QPS")
    else:
        print("unknown PROF_TARGET", TARGET)
        sys.exit(2)

    parse_trace(TRACE_DIR)


if __name__ == "__main__":
    main()

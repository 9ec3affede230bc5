"""Name the beam search's dominant fusions + A/B the (expand, Q) grid.

The r5 trace (profile_graph.py) shows one 1M ef64 batch = ~58 loop
iterations with two fusions carrying ~86% of device time:
fusion.89 ~747 us/iter + fusion.88 ~467 us/iter. This script compiles the
IDENTICAL program, dumps the optimized HLO, and prints those fusion
bodies so the breakdown in BASELINE.md names real ops, not numbers.

Then it measures QPS/recall over expand x Q to see whether the sweet spot
moved once the dominant term is known.

Env: BH_N (1M), BH_SKIP_GRID=1 to dump HLO only.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("BH_N", 1_000_000))
EF = int(os.environ.get("BH_EF", 64))
HLO_PATH = os.environ.get("BH_HLO", "/tmp/beam_hlo.txt")


def dump_fusions(text: str, names: list[str]):
    for nm in names:
        # fused_computation bodies are named %fused_computation.N; the
        # fusion op line references them: %fusion.N = ... fusion(...),
        # kind=kLoop/kInput, calls=%fused_computation.N
        m = re.search(rf"%{nm} = \S+ fusion\([^\n]*", text)
        if not m:
            print(f"--- {nm}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {nm}: {line[:400]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            body = re.search(
                rf"%?{re.escape(cm.group(1))} \(.*?\n(.*?)\n\}}",
                text, re.S)
            if body:
                lines = body.group(1).splitlines()
                print(f"    body ({len(lines)} ops):")
                for ln in lines:
                    ln = ln.strip()
                    # drop parameter lines; keep real ops
                    if " parameter(" in ln:
                        continue
                    print("     ", ln[:240])


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

    q0 = jax.random.normal(jax.random.PRNGKey(7), (1024, dim), jnp.float32)
    lowered = search_batched.lower(g, q0, k=10, ef=EF, expand=2)
    compiled = lowered.compile()
    text = compiled.as_text()
    with open(HLO_PATH, "w") as f:
        f.write(text)
    print(f"HLO saved: {HLO_PATH} ({len(text)} B)", flush=True)
    dump_fusions(text, ["fusion.89", "fusion.88", "fusion.85"])

    if os.environ.get("BH_SKIP_GRID") == "1":
        return

    # ---- ground truth for recall (HIGHEST-precision exact scan) ----
    from lantern_tpu.flat import flat_search
    nq_r = 256
    d_t, ids_t = flat_search(g.vectors, g.sq_norms, q0[:nq_r], k=10,
                             metric=g.metric, exact=True)
    true_ids = __import__("numpy").asarray(ids_t)

    out = {"n": N, "ef": EF, "grid": {}}
    for q in (1024, 2048, 4096):
        qb = jax.random.normal(jax.random.PRNGKey(7), (4, q, dim), jnp.float32)
        qb = qb.at[0, :1024].set(q0)  # recall queries ride batch 0
        for expand in (1, 2, 4):
            @jax.jit
            def timed(g, qbs, expand=expand):
                def body(acc, qq):
                    d, i, lab = search_batched(g, qq, k=10, ef=EF,
                                               expand=expand)
                    return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), qbs)
                return acc
            _ = float(timed(g, qb))
            best = 1e18
            for rep in range(3):
                t0 = time.perf_counter()
                _ = float(timed(g, qb + 1e-3 * (rep + 1)))
                best = min(best, time.perf_counter() - t0)
            qps = 4 * q / best
            # recall at the Q=1024 compile shape (first nq_r rows scored);
            # recall is Q-invariant — batching does not change the per-query
            # program semantics
            _, ids, _ = search_batched(g, q0, k=10, ef=EF, expand=expand)
            np = __import__("numpy")
            ids = np.asarray(ids)[:nq_r]
            rec = float(np.mean([
                len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10
                for i in range(nq_r)]))
            out["grid"][f"q{q}_expand{expand}"] = {
                "qps": round(qps, 1), "recall": round(rec, 4),
                "ms_per_batch": round(best / 4 * 1e3, 2)}
            print(f"Q={q} expand={expand}: {qps:.0f} QPS recall {rec:.4f}",
                  flush=True)

    path = os.path.join(os.path.dirname(__file__), "beam_grid_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

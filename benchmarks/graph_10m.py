"""10M-vector GRAPH build + search on ONE chip (BASELINE item 5, graph leg).

benchmarks/flat_10m.py already shows the flat MXU scan serving 10M rows
HBM-resident; this benchmark proves the GRAPH path at the same scale — the
structure that matters beyond HBM (sharding) and for incremental serving.
SIFT-shaped clustered data generated on device (no egress; see
clustered_1m.py for why gaussian recall is not the representative case).

HBM budget on v5e (16 GB): vectors f32 4.8 GB (donated into the build — no
defensive copy), bf16 gather view 2.4 GB, level-0 adjacency 1.2 GB, upper
levels ~0.6 GB, plus transient blocks. Writes graph_10m_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

K = 10
EFS = (32, 64, 128)


def _stage(msg):
    print(f"[g10m {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # the package sets a machine-fingerprinted cache dir on import;
    # honor an explicit JAX_CACHE_DIR override only
    if os.environ.get("JAX_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_CACHE_DIR"])
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001
            pass

    from lantern_tpu.config import HnswParams
    from lantern_tpu.flat import flat_search
    from lantern_tpu.graph.build_device import build_on_device
    from lantern_tpu.graph.device import join_labels
    from lantern_tpu.graph.search import search_batched

    n = int(os.environ.get("G10M_N", 10_000_000))
    dim = 128
    q = int(os.environ.get("G10M_Q", 1024))
    iters = int(os.environ.get("G10M_ITERS", 10))
    jitter = float(os.environ.get("G10M_JITTER", 0.35))
    n_centers = 32768
    # r5 default hybrid: pure "flat" candidate generation scans the ENTIRE
    # built prefix per insert round — Σ rounds B*prefix*dim*2 ≈ n²·dim
    # FLOPs, O(n²) in table size. That term explains the r4 10M collapse
    # (18.9k inserts/s at 1M -> 3.4k at 10M: 100x the prefix-scan FLOPs for
    # 10x the rows); hybrid switches to beam candidate search once the
    # graph can route (see build_device.build_on_device flat_until).
    cand = os.environ.get("G10M_CANDIDATES", "hybrid")  # flat | hybrid | beam

    # compile-share accounting (the r4c lesson: the clustered-1M "build
    # cliff" was compile time, not data) — jax.monitoring reports every
    # backend compile duration; cold-vs-warm splits the XLA share out
    compile_acc = {"s": 0.0, "n": 0}

    def _on_event(event: str, duration: float, **kw):
        if "backend_compile" in event:
            compile_acc["s"] += duration
            compile_acc["n"] += 1

    try:
        from jax import monitoring as _mon

        _mon.register_event_duration_secs_listener(_on_event)
    except Exception:  # noqa: BLE001
        pass

    centers = jax.random.normal(jax.random.PRNGKey(0), (n_centers, dim),
                                jnp.float32)

    @jax.jit
    def gen(centers):
        # one fusion: the 10M x 128 normal draw never materializes
        # separately from the output (HBM peak = the output block)
        assign = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, n_centers)
        base = centers[assign] + jitter * jax.random.normal(
            jax.random.PRNGKey(2), (n, dim), jnp.float32
        )
        qassign = jax.random.randint(jax.random.PRNGKey(8), (q,), 0, n_centers)
        queries = centers[qassign] + jitter * jax.random.normal(
            jax.random.PRNGKey(7), (q, dim), jnp.float32
        )
        return base, queries

    base, queries = gen(centers)
    jax.block_until_ready((base, queries))

    out = {"n": n, "dim": dim, "jitter": jitter, "n_centers": n_centers,
           "m": 16, "ef_construction": 128}

    # exact f32 ground truth BEFORE the build: the f32 table is cast to
    # bf16 (and freed) to fit the 10M build in HBM (store="bf16")
    _stage("exact ground truth (f32 flat exact scan)")
    nq_r = min(q, 256)
    sqn = jnp.einsum("nd,nd->n", base, base)
    _, true_ids = flat_search(base, sqn, queries[:nq_r], k=K,
                              exact=True, block=1 << 19)
    true_np = np.asarray(true_ids)
    del sqn

    base = base.astype(jnp.bfloat16)  # frees the 4.8 GB f32 table

    params = HnswParams(dim=dim, m=16, ef_construction=128)

    def _build(tag, tab):
        c0 = compile_acc["s"]
        _stage(f"device build ({tag}, donated bf16 vectors)")
        t0 = time.perf_counter()
        gg = build_on_device(tab, params, batch=1024, seed=0, donate=True,
                             store="bf16", candidates=cand,
                             progress_cb=lambda f: _stage(
                                 f"  build {tag} {f * 100:.0f}% enqueued"
                             ))
        _ = int(jnp.sum(gg.levels))
        wall = time.perf_counter() - t0
        out[f"build_device_{tag}_s"] = round(wall, 1)
        out[f"build_{tag}_compile_s"] = round(compile_acc["s"] - c0, 1)
        _stage(f"build {tag} {wall:.0f}s "
               f"(compile {compile_acc['s'] - c0:.0f}s)")
        return gg

    # cold: fresh-process compiles included (persistent cache may still
    # serve some); warm: the steady-state rebuild cost (r4c methodology)
    g = _build("cold", base)
    del base  # donated — the table now lives as g.vectors (bf16)
    if os.environ.get("G10M_SKIP_WARM") != "1":
        del g  # free adjacency+vectors before regenerating the table
        base2, _q2 = gen(centers)
        base2 = base2.astype(jnp.bfloat16)
        g = _build("warm", base2)
        del base2
        out["build_device_s"] = out["build_device_warm_s"]
    else:
        out["build_device_s"] = out["build_device_cold_s"]
    out["build_inserts_per_s"] = round(n / out["build_device_s"], 1)
    out["store"] = "bf16"
    out["candidates"] = cand

    # steady-state incremental-insert probe at FULL table size: one more
    # 16k-row device_insert on the built 10M graph, timed warm — the
    # per-insert cost at n=10M that the r4 verdict asked to be explained
    if os.environ.get("G10M_SKIP_INSERT_PROBE") != "1":
        from lantern_tpu.graph.build_device import device_insert

        probe = 16384

        # generate ONLY the probe rows — regenerating the full 10M table
        # beside the built graph OOMs HBM (r5: RESOURCE_EXHAUSTED)
        @jax.jit
        def gen_probe(centers):
            a = jax.random.randint(jax.random.PRNGKey(11), (probe,), 0,
                                   n_centers)
            return centers[a] + jitter * jax.random.normal(
                jax.random.PRNGKey(12), (probe, dim), jnp.float32)

        extra_rows = np.asarray(gen_probe(centers))
        _stage("steady-state insert probe (16k rows at n=10M)")
        t0 = time.perf_counter()
        g = device_insert(g, extra_rows, batch=1024, seed=123,
                          candidates="beam")
        _ = int(jnp.sum(g.levels))
        out["insert_probe_rows"] = probe
        out["insert_probe_s"] = round(time.perf_counter() - t0, 1)
        out["insert_probe_inserts_per_s"] = round(
            probe / out["insert_probe_s"], 1)
        _stage(f"insert probe {out['insert_probe_s']}s")

    out["compile_total_s"] = round(compile_acc["s"], 1)
    out["compile_events"] = compile_acc["n"]

    def _recall(ids, labels):
        lab = join_labels(np.asarray(labels)).astype(np.int64)
        lab = np.where(np.asarray(ids) >= 0, lab, -1)
        return float(np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
            for a, b in zip(lab, true_np)
        ]))

    q_batches = jnp.stack([queries + 1e-3 * (i + 1) for i in range(iters)])

    out["graph"] = {}
    for ef in EFS:
        _stage(f"graph ef={ef}")

        @jax.jit
        def timed(graph, qbs, ef=ef):
            def body(acc, qb):
                d, _, _ = search_batched(graph, qb, k=K, ef=ef, expand=2)
                return acc + jnp.sum(jnp.where(jnp.isfinite(d), d, 0)), None
            return jax.lax.scan(body, jnp.float32(0), qbs)[0]

        _ = float(timed(g, q_batches))
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(timed(g, q_batches + 1e-4 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        _, ids, labs = search_batched(g, queries[:nq_r], k=K, ef=ef, expand=2)
        out["graph"][f"ef{ef}"] = {
            "qps": round(q * iters / best, 1),
            "recall": round(_recall(ids, labs), 4),
        }
        _stage(f"ef={ef}: {out['graph'][f'ef{ef}']}")

    res = {"config": out, "device": str(jax.devices()[0])}
    print(json.dumps(res))
    suffix = "" if cand == "flat" else f"_{cand}"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"graph_10m{suffix}_result.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

"""Index parameter autotuning — parity with lantern_cli index_autotune.

Reference (lantern_cli/src/index_autotune/mod.rs):
- samples up to N rows into a test table, computes exact ground truth for 10
  random queries via seq scan (:188-218)
- iterates 6 (m, ef_construction, ef) variants (:328-359):
  (6,32,64) (8,40,64) (12,48,64) (16,60,76) (32,96,96) (48,128,128)
- measures recall@k, query latency, build time per variant (:220-254)
- picks the fastest (latency, then build time) variant meeting the target
  recall (:161-186)

Here the variants build on the device builder (or native engine), queries run
batched on device, ground truth via the exact oracle.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from lantern_tpu.config import HnswParams, Metric

# (m, ef_construction, ef) — index_autotune/mod.rs:328-359
AUTOTUNE_VARIANTS = (
    (6, 32, 64),
    (8, 40, 64),
    (12, 48, 64),
    (16, 60, 76),
    (32, 96, 96),
    (48, 128, 128),
)


@dataclasses.dataclass
class AutotuneResult:
    m: int
    ef_construction: int
    ef: int
    recall: float
    latency_s: float
    build_s: float
    # which builder produced build_s: "native" (1-core host engine,
    # ~0.8-1.6k inserts/s) or "device". Recorded in the stored payload so
    # results saved before/after an engine-default change stay
    # interpretable (ADVICE r3); rows stored before this field existed
    # load as "unknown".
    engine: str = "unknown"

    def exp_str(self) -> str:
        return (
            f"m={self.m} efc={self.ef_construction} ef={self.ef}: "
            f"recall={self.recall:.3f} latency={self.latency_s*1e3:.2f}ms "
            f"build={self.build_s:.1f}s [{self.engine}]"
        )


def load_prior_result(model_name: str, results_path: str,
                      target_recall: float) -> AutotuneResult | None:
    """Reuse a prior autotune result for the same model name — parity with
    the reference skipping the sweep when `_lantern_extras_internal
    .autotune_results` already has rows for the model (mod.rs:111-159)."""
    import json
    import os

    if not model_name or not os.path.exists(results_path):
        return None
    with open(results_path) as f:
        store = json.load(f)
    rows = store.get(model_name, [])
    meeting = [AutotuneResult(**r) for r in rows
               if r["recall"] >= target_recall]
    if not meeting:
        return None
    return min(meeting, key=lambda r: (r.latency_s, r.build_s))


def save_results(model_name: str, results: list[AutotuneResult],
                 results_path: str):
    """Append this sweep's rows under the model name (export_results analog)."""
    import json
    import os

    store = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            store = json.load(f)
    store.setdefault(model_name, []).extend(vars(r) for r in results)
    tmp = results_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(store, f)
    os.replace(tmp, results_path)


def autotune(
    vectors: np.ndarray,
    metric: Metric = Metric.L2SQ,
    k: int = 10,
    target_recall: float = 0.9,
    sample: int = 10_000,
    num_queries: int = 10,
    variants=AUTOTUNE_VARIANTS,
    seed: int = 0,
    engine: str = "native",
    model_name: str | None = None,
    results_path: str | None = None,
) -> tuple[AutotuneResult | None, list[AutotuneResult]]:
    """Sweep variants; returns (best_meeting_target_or_None, all_results).

    With ``model_name`` + ``results_path``, a prior stored result meeting
    the target short-circuits the sweep, and fresh sweeps are appended to
    the store (mod.rs:111-159 reuse semantics).

    ``engine`` picks the variant BUILD path; search latency/recall are
    always measured batched on device:

    - ``"native"`` (default): build each variant on the host engine. At the
      <=10k-row autotune sample this is seconds per variant and compiles
      nothing new; only the 6 per-(m, ef) search programs are jitted.
      Variant RANKING is what autotune needs, and it is preserved (host
      build time is monotone in m*ef_construction like the device build,
      and host-built graphs score the same recall class — device builds
      measure slightly BETTER, so a variant meeting the target here meets
      it at scale).
    - ``"device"``: build each variant with the device builder — measures
      true device build time, but each (m, efc) variant compiles ~10
      distinct XLA programs; with a cold compile cache through this
      environment's 30-90 s remote-compile tunnel the 6-variant sweep
      spends most of an hour compiling before any measurement. Use when
      device build time is itself the quantity being tuned.
    """
    if model_name and results_path:
        prior = load_prior_result(model_name, results_path, target_recall)
        if prior is not None:
            return prior, [prior]
    import jax
    import jax.numpy as jnp

    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.ops import exact_search

    rng = np.random.default_rng(seed)
    vectors = np.asarray(vectors, np.float32)
    if len(vectors) > sample:
        idx = rng.choice(len(vectors), sample, replace=False)
        vectors = vectors[idx]
    n, dim = vectors.shape

    qidx = rng.choice(n, size=min(num_queries, n), replace=False)
    queries = vectors[qidx] + 0.0
    # exact ground truth (mod.rs:188-218's seq-scan oracle)
    _, true_ids = exact_search(jnp.asarray(queries), jnp.asarray(vectors),
                               k=k, metric=metric)
    true_ids = np.asarray(true_ids)

    results: list[AutotuneResult] = []
    for m, efc, ef in variants:
        p = HnswParams(dim=dim, m=m, ef_construction=min(efc, 400),
                       ef=min(ef, 400), metric=metric)
        t0 = time.perf_counter()
        if engine == "device":
            from lantern_tpu.graph.build_device import build_on_device

            g = build_on_device(vectors, p, batch=min(512, n), seed=seed)
        else:
            from lantern_tpu.graph.device import to_device
            from lantern_tpu.native import NativeHnsw

            ix = NativeHnsw(p, capacity=n, seed=seed)
            ix.add(vectors)
            g = to_device(ix)
        jax.block_until_ready(g.neighbors0)
        build_s = time.perf_counter() - t0

        qs = jnp.asarray(queries)
        d, ids, _ = search_batched(g, qs, k=k, ef=ef)
        jax.block_until_ready(d)  # compile
        # Timing discipline (see bench.py): block_until_ready is not a
        # reliable completion barrier through this environment's device
        # tunnel and per-call dispatch is expensive — time ONE jitted
        # lax.scan over distinct query batches, completed by a scalar fetch.
        # >= 48 in-jit iterations, else the fixed ~40 ms tunnel dispatch
        # dominates millisecond batches and variant ranking is RTT noise;
        # best-of-2 because the first post-compile run is 2-3x slow
        # (CLAUDE.md measurement discipline)
        reps = 48
        qbs = jnp.stack([qs + 1e-4 * (i + 1) for i in range(reps)])

        @jax.jit
        def _timed(graph, qbs):
            def body(acc, qb):
                dd, _, _ = search_batched(graph, qb, k=k, ef=ef)
                return acc + jnp.sum(jnp.where(jnp.isfinite(dd), dd, 0)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), qbs)
            return acc

        _ = float(_timed(g, qbs))  # compile + warm
        best = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(_timed(g, qbs + 1e-5 * (rep + 1)))
            best = min(best, time.perf_counter() - t0)
        latency = best / reps
        ids = np.asarray(ids)
        recall = float(
            np.mean(
                [
                    len(set(a[a >= 0].tolist()) & set(b.tolist())) / k
                    for a, b in zip(ids, true_ids)
                ]
            )
        )
        results.append(
            AutotuneResult(m, efc, ef, recall, latency, build_s,
                           engine=engine)
        )

    # selection: fastest meeting target, ties by build time (mod.rs:161-186)
    meeting = [r for r in results if r.recall >= target_recall]
    best = min(meeting, key=lambda r: (r.latency_s, r.build_s)) if meeting else None
    if model_name and results_path:
        save_results(model_name, results, results_path)
    return best, results

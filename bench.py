"""Headline benchmark: TPU vector search vs the native CPU engine.

Methodology (BASELINE.md): the reference publishes no numbers, so the
baseline is the CPU HNSW engine (the role usearch plays for Lantern) at
identical (M, ef_construction, ef) searching the IDENTICAL graph. Two TPU
search strategies are measured (Index.search's planner dispatch):
- flat:  dense MXU scan + approx top-k (flat.py) — the TPU-native fast path
- graph: batched HNSW beam search (graph/search.py)

Evidence requirements (VERDICT r1 #1/#2):
- both n=100k and n=1M on the same run
- recall-vs-QPS over an ef sweep (64/128/256), not one ambiguous point
- builder-quality proof: recall of the DEVICE-built graph vs a graph built
  by the sequential native engine on the same data, same efs (delta <= 0.02)

All timings use the tunnel-proof discipline: one jitted lax.scan over
distinct query batches, completed by a scalar fetch (see CLAUDE.md).

Prints ONE JSON line. Env knobs: BENCH_SKIP_1M=1, BENCH_SKIP_HOST_BUILD=1
(the host build costs ~2 min of single-core time), BENCH_Q, BENCH_DIM.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

K = 10
EF_SWEEP = (64, 128, 256)
# MFU denominator: bf16 matmul peak of the bench device (v5e ~197 TFLOP/s;
# override for other hardware). MFU fields make perf regressions visible
# next to the absolute QPS (a QPS drop can hide behind a dataset change;
# %-of-peak cannot).
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
# HBM peak of the bench device (v5e ~819 GB/s) for the graph path's
# bandwidth-utilization field: the beam is gather-bound, so its roofline is
# bytes, not FLOPs — bw_util makes regressions in the hot gather visible
# the way mfu does for the matmul paths (VERDICT r3 weak #6).
PEAK_GBPS = float(os.environ.get("BENCH_PEAK_GBPS", 819.0))


def _mfu(flops_per_s: float) -> float:
    return round(flops_per_s / (PEAK_TFLOPS * 1e12), 4)


def _timed_qps(search_fn, graph, q_batches, q, iters):
    """One jitted scan over distinct query batches -> QPS."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def timed(graph, qbs):
        def body(acc, qb):
            dd = search_fn(graph, qb)
            return acc + jnp.sum(jnp.where(jnp.isfinite(dd), dd, 0)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), qbs)
        return acc

    _ = float(timed(graph, q_batches))  # compile + warm
    # best-of-2: the FIRST post-compile execution is often 2-3x slow through
    # the remote-execute tunnel (measured on the PQ scan: 75 ms single-shot
    # vs 29 ms steady-state) — one timed run under-reports steady-state QPS
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        _ = float(timed(graph, q_batches + 1e-3 * (rep + 1)))
        best = min(best, time.perf_counter() - t0)
    return q * iters / best


def _recall(found_labels, true_ids):
    return float(np.mean([
        len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
        for a, b in zip(found_labels, true_ids)
    ]))


def _graph_labels_np(ids, labels):
    from lantern_tpu.graph.device import join_labels

    out = join_labels(np.asarray(labels)).astype(np.int64)
    return np.where(np.asarray(ids) >= 0, out, -1)


def _stage(msg):
    import sys
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def bench_config(n, dim, q, iters, host_build: bool):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lantern_tpu.config import HnswParams
    from lantern_tpu.flat import flat_search_graph
    from lantern_tpu.graph.build_device import build_on_device
    from lantern_tpu.graph.search import search_batched
    from lantern_tpu.native import NativeHnsw

    params = HnswParams(dim=dim, m=16, ef_construction=128)
    base = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(7), (q, dim), jnp.float32)
    jax.block_until_ready((base, queries))
    out = {"n": n, "dim": dim, "m": 16, "ef_construction": 128}

    # ---- device build ----
    # first build includes jit compiles (the ramped batch schedule is ~10
    # distinct programs; 60-90 s each through the remote-compile tunnel when
    # the persistent cache is cold); the second build is the steady-state
    # number — what re-building or building another same-shape index costs.
    # Timing closes with a SCALAR FETCH: block_until_ready is not a reliable
    # completion barrier through the tunnel (CLAUDE.md) — the warm build
    # otherwise "finishes" in 0.0 s.
    def _timed_build():
        t0 = time.perf_counter()
        g = build_on_device(base, params, batch=1024, seed=0)
        _ = int(jnp.sum(g.levels))  # scalar fetch = real completion barrier
        return g, time.perf_counter() - t0

    _stage(f"n={n}: device build (cold)")
    g, cold_s = _timed_build()
    out["build_device_cold_s"] = round(cold_s, 1)
    _stage(f"n={n}: device build (warm)")
    g, warm_s = _timed_build()
    out["build_device_s"] = round(warm_s, 2)
    out["build_device_inserts_per_s"] = round(n / max(warm_s, 1e-9), 1)
    # build MFU (approx): the dominant FLOPs are the per-round masked flat
    # candidate scans over the built prefix — sum_rounds B*prefix*dim*2
    # ~= n^2*dim (average prefix n/2). Gather/sort/scatter phases execute
    # no MXU FLOPs, so this UNDERSTATES utilization of the matmul phase and
    # is tracked for regressions, not as a roofline claim.
    out["build_mfu_approx"] = _mfu(n * n * dim / max(warm_s, 1e-9))

    # bf16 storage for the search paths (+25-30% QPS at equal recall), plus
    # the r5 norm-folded row table: x2 rides the candidate row gather, so
    # the beam's [Q, C] sq_norms SCALAR gather (467 us/iter = 30% of a 1M
    # ef64 batch, trace fusion.88) disappears (graph/device.aug_norms_table)
    from lantern_tpu.graph.device import with_aug_norms

    g_search = with_aug_norms(
        dataclasses.replace(g, vectors=g.vectors.astype(jnp.bfloat16))
    )
    expand = int(os.environ.get("BENCH_EXPAND", 2))
    # upper-scan multi-seeding: the dense entry scan prices top-16 the same
    # as top-1, and 16 separated seeds reach the query basin in fewer beam
    # iterations (beam_opt_result.json: recall strictly above single-seed
    # at every measured iteration budget)
    seeds = int(os.environ.get("BENCH_SEEDS", 16))
    q_batches = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(100 + i), (q, dim), jnp.float32)
        for i in range(iters)
    ])
    # every loop DISPATCH through the remote-execute tunnel costs a fixed
    # ~40 ms (measured: 1M flat scan per-batch time 6.5 -> 2.7 -> 2.1 ms at
    # 8/32/64 iters, asymptote 1.46 ms = within 10% of the matmul roofline).
    # The fast paths need long scans to report device throughput rather
    # than tunnel RTT; the graph path at >= 30 ms/batch amortizes already.
    iters_flat = int(os.environ.get("BENCH_FLAT_ITERS", 64))
    q_batches_flat = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(100 + i), (q, dim), jnp.float32)
        for i in range(iters_flat)
    ])

    # ---- exact ground truth (f32, exact top-k) for recall ----
    from lantern_tpu.flat import flat_search

    _stage(f"n={n}: exact ground truth")
    nq_r = min(q, 256)
    _, true_ids = flat_search(
        base, jnp.sum(base * base, axis=1), queries[:nq_r], k=K, exact=True
    )
    true_np = np.asarray(true_ids)

    # ---- flat scan: QPS + recall ----
    def flat_fn(graph, qb):
        d, _, _ = flat_search_graph(graph, qb, k=K, recall_target=0.95)
        return d

    _stage(f"n={n}: flat scan")
    out["flat"] = {}
    out["flat"]["qps"] = round(
        _timed_qps(flat_fn, g_search, q_batches_flat, q, iters_flat), 1
    )
    _, ids_f, labs_f = flat_search_graph(g_search, queries[:nq_r], k=K,
                                         recall_target=0.95)
    out["flat"]["recall"] = round(_recall(_graph_labels_np(ids_f, labs_f), true_np), 4)
    # MFU: the scan's matmul is Q*N*dim*2 FLOPs per query batch
    out["flat"]["mfu"] = _mfu(out["flat"]["qps"] * n * dim * 2)

    # ---- flat ADC scan over PQ codes (memory-parity path, BASELINE #4) ----
    if os.environ.get("BENCH_SKIP_PQ") != "1":
        from lantern_tpu.flat import flat_search_pq
        _stage(f"n={n}: pq train/encode/scan")
        from lantern_tpu.quant.pq import _encode_jit, _train_jit

        # stay device-resident end to end (host<->device transfers stall
        # through the tunnel — CLAUDE.md): jitted train/encode on the
        # device arrays directly
        cents = _train_jit(base[:100_000], 0, 32, 256, 10)
        codes = _encode_jit(base, cents)

        def pq_fn(codes_and_cents, qb):
            cd, ct = codes_and_cents
            d, _ = flat_search_pq(cd, ct, qb, k=K, recall_target=0.95)
            return d

        out["flat_pq"] = {
            "qps": round(
                _timed_qps(pq_fn, (codes, cents), q_batches_flat, q, iters_flat), 1
            ),
            "code_bytes_per_vector": 32,
        }
        _, ids_pq = flat_search_pq(codes, cents, queries[:nq_r], k=K,
                                   recall_target=0.95)
        ids_pq = np.asarray(ids_pq)
        out["flat_pq"]["recall_vs_f32_truth"] = round(float(np.mean([
            len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
            for a, b in zip(ids_pq, true_np)
        ])), 4)
        # MFU: per query batch the ADC scan executes a Q-independent decode
        # plus the Q*N*dim*2 scoring matmul. The decode's executed MXU work
        # depends on the kernel actually selected (same predicate as
        # flat_search_pq — ADVICE r3): 8-bit codes take the hi/lo kernel
        # (pallas_kernels._make_hilo_kernel) whose dense FLOPs per row are
        # ng*(w1*w2 + grp*w1 + grp*w2)*2 (stage-1 contraction + the two
        # spread dots; the stage-2 reduction is slice-halving VPU adds, not
        # matmul). Non-256-K configs take the one-hot pq_decode_mxu path.
        from lantern_tpu.ops.pallas_kernels import _hilo_plan
        s_pq = int(codes.shape[1])
        k_pq = int(cents.shape[1])
        dsub = dim // s_pq
        plan = _hilo_plan(s_pq, dsub) if k_pq == 256 else None
        if plan is not None:
            hi_w, lo_w, grp = plan
            ng = s_pq // grp
            w1, w2 = grp * hi_w, lo_w * grp * dsub
            decode_flops = n * ng * (w1 * w2 + grp * w1 + grp * w2) * 2
        else:  # one-hot block-diagonal path
            decode_flops = n * s_pq * k_pq * dsub * 2
        batches_per_s = out["flat_pq"]["qps"] / q
        pq_flops = decode_flops + q * n * dim * 2
        out["flat_pq"]["mfu"] = _mfu(batches_per_s * pq_flops)

        # two-stage PQ: ADC shortlist + exact rerank on the bf16 rows (the
        # reference keeps raw vectors in the heap beside its PQ index, so a
        # full-precision rerank source always exists)
        from lantern_tpu.flat import flat_search_pq_rerank
        _stage(f"n={n}: pq rerank scan")
        sqn = jnp.sum(base * base, axis=1)
        # rerank rows must be index-aligned with the codes (both encode
        # `base` row i), so use the base table itself, bf16.
        # Two shortlist depths: reranked recall@10 = the ADC scan's
        # recall@shortlist, so the deeper shortlist trades a little QPS for
        # the recall the quantized index is judged on.
        base_bf = base.astype(jnp.bfloat16)
        for short in (100, 300):
            def pqr_fn_s(arrs, qb, short=short):
                cd, ct, vec, sn = arrs
                d, _ = flat_search_pq_rerank(cd, ct, vec, sn, qb, k=K,
                                             shortlist=short,
                                             recall_target=0.95)
                return d

            arrs = (codes, cents, base_bf, sqn)
            key = f"flat_pq_rerank{short}"
            out[key] = {
                "qps": round(
                    _timed_qps(pqr_fn_s, arrs, q_batches_flat, q, iters_flat),
                    1,
                ),
            }
            _, ids_pr = flat_search_pq_rerank(codes, cents, base_bf,
                                              sqn, queries[:nq_r], k=K,
                                              shortlist=short,
                                              recall_target=0.95)
            ids_pr = np.asarray(ids_pr)
            out[key]["recall"] = round(float(np.mean([
                len(set(a[a >= 0].tolist()) & set(b.tolist())) / K
                for a, b in zip(ids_pr, true_np)
            ])), 4)

    # ---- graph search: ef sweep, QPS + recall (device-built graph) ----
    out["graph"] = {}
    for ef in EF_SWEEP:
        _stage(f"n={n}: graph search ef={ef}")
        # serving config for the headline ef=64 leg: iteration budget 32
        # (vs the 2*ef/expand+16 = 80 default) — with 16 seeds the recall
        # measured right below stays at-or-above the uncapped single-seed
        # baseline (beam_opt_result.json: 22.0k QPS @ 0.2664 vs 11.5k @
        # 0.2609), so the cap trades only straggler iterations that no
        # longer buy recall. Other ef legs keep default semantics.
        mi = (int(os.environ["BENCH_MAX_ITERS"])
              if "BENCH_MAX_ITERS" in os.environ
              else (32 if ef == 64 else None))

        def graph_fn(graph, qb, ef=ef, mi=mi):
            d, _, _ = search_batched(graph, qb, k=K, ef=ef, expand=expand,
                                     seeds=seeds, max_iters=mi)
            return d

        qps = _timed_qps(graph_fn, g_search, q_batches, q, iters)
        _, ids_g, labs_g, gstats = search_batched(
            g_search, queries[:nq_r], k=K, ef=ef, expand=expand,
            seeds=seeds, max_iters=mi, with_stats=True,
        )
        # achieved HBM bandwidth of the beam's gathers: per query, `visited`
        # candidate vector rows (dim x bf16) + `expanded` adjacency rows
        # (2m x i32) stream from HBM. Row gathers are row-LATENCY-bound on
        # TPU (CLAUDE.md), so bw_util quantifies how far the hot gather sits
        # from the bytes roofline — a regression there is invisible to QPS
        # alone when the dataset changes.
        visited = float(np.asarray(gstats["visited"], np.float64).mean())
        expanded = float(np.asarray(gstats["expanded"], np.float64).mean())
        bytes_per_q = (
            visited * dim * g_search.vectors.dtype.itemsize
            + expanded * 2 * params.m * 4
        )
        achieved_gbps = qps * bytes_per_q / 1e9
        out["graph"][f"ef{ef}"] = {
            "qps": round(qps, 1),
            "recall_device_build": round(
                _recall(_graph_labels_np(ids_g, labs_g), true_np), 4
            ),
            "visited_per_query": round(visited, 1),
            "achieved_gbps": round(achieved_gbps, 1),
            "bw_util": round(achieved_gbps / PEAK_GBPS, 4),
            "seeds": seeds,
            "max_iters": mi,
        }

    # ---- PQ-coded graph: ADC in the beam (beyond-HBM serving mode) ----
    # codes ride the SAME adjacency the f32 build produced (the reference
    # builds its PQ HNSW over decoded vectors, build.c:497-517; exact-vector
    # edges are a superset in quality). Storage = N*S code bytes, 16x less
    # than f32 — the mode that serves when vectors no longer fit HBM.
    if os.environ.get("BENCH_SKIP_PQ") != "1" and n >= 1_000_000:
        from lantern_tpu.graph.device import QUANT_PQ

        g_pq = dataclasses.replace(
            g, vectors=codes, quant=QUANT_PQ, pq_codebook=cents,
            vectors_aug=None, upper_vectors=None, upper_sq=None,
        )
        out["graph_pq"] = {}
        for ef in (64, 128):
            _stage(f"n={n}: graph_pq search ef={ef}")

            def gpq_fn(graph, qb, ef=ef):
                d, _, _ = search_batched(graph, qb, k=K, ef=ef,
                                         expand=expand, seeds=seeds)
                return d

            # Mosaic/VMEM failures for new kernel shapes are COMPILE-time
            # and TPU-only (CLAUDE.md) — never lose the whole artifact to
            # this leg
            try:
                qps = _timed_qps(gpq_fn, g_pq, q_batches, q, iters)
                _, ids_gp, labs_gp = search_batched(
                    g_pq, queries[:nq_r], k=K, ef=ef, expand=expand,
                    seeds=seeds,
                )
                out["graph_pq"][f"ef{ef}"] = {
                    "qps": round(qps, 1),
                    "recall_vs_f32_truth": round(
                        _recall(_graph_labels_np(ids_gp, labs_gp), true_np), 4
                    ),
                    "code_bytes_per_vector": int(codes.shape[1]),
                }
            except Exception as e:  # noqa: BLE001
                out["graph_pq"][f"ef{ef}"] = {"error": str(e)[:300]}
                break

    # ---- CPU baseline: the native engine searches the IDENTICAL graph ----
    _stage(f"n={n}: cpu baseline")
    ix = NativeHnsw(params, capacity=n, seed=0)
    ix.import_graph(g)
    q_np = np.asarray(queries[:200])
    best = float("inf")  # best-of-3: the jax runtime's background threads
    # intermittently steal the single host core and depress the CPU number
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(len(q_np)):
            ix.search(q_np[i], k=K, ef=64)
        best = min(best, time.perf_counter() - t0)
    out["cpu_qps_ef64"] = round(len(q_np) / best, 1)
    del ix

    # equal-recall comparator for the 0.98-recall flat scan: a CPU exact
    # scan (the only CPU config that matches its recall class). The HNSW
    # number above is the reference-system-at-its-best comparator. Exact
    # scan is linear in n, so time a <=200k slice (a full 1M host fetch
    # can stall the tunnel) and scale.
    nsub = min(n, 200_000)
    base_np_sc = np.asarray(base[:nsub])
    q_sc = np.asarray(queries[:4])
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        dots = q_sc @ base_np_sc.T  # [4, nsub]
        _ = np.argpartition(-dots, K, axis=1)[:, :K]
        best = min(best, time.perf_counter() - t0)
    out["cpu_exact_scan_qps"] = round(len(q_sc) / best * nsub / n, 1)
    del base_np_sc

    # ---- builder-quality proof: sequential host build on the same data ----
    if host_build:
        from lantern_tpu.graph.device import to_device

        _stage(f"n={n}: sequential host build")
        base_np = np.asarray(base)
        hb = NativeHnsw(params, capacity=n, seed=0)
        t0 = time.perf_counter()
        hb.add(base_np, nthreads=1)  # sequential reference build
        out["build_host_s"] = round(time.perf_counter() - t0, 1)
        out["build_ratio_device_over_host"] = round(
            out["build_host_s"] / out["build_device_s"], 2
        )
        gh = to_device(hb, dtype=jnp.bfloat16)
        for ef in EF_SWEEP:
            _, ids_h, labs_h = search_batched(gh, queries[:nq_r], k=K,
                                              ef=ef, expand=expand)
            rec_h = _recall(_graph_labels_np(ids_h, labs_h), true_np)
            entry = out["graph"][f"ef{ef}"]
            entry["recall_host_build"] = round(rec_h, 4)
            entry["recall_delta"] = round(
                rec_h - entry["recall_device_build"], 4
            )
        del hb
    return out


def _wait_for_tpu(max_wait_s: int):
    """Block until the TPU backend answers a trivial op (probed in a
    SUBPROCESS — a failed in-process backend init is cached by jax, so the
    probe must not poison this process). The axon tunnel goes fully down
    for 45+ min at a time; without this, a transient outage at bench time
    loses the round's artifact."""
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 8)))))")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=120,
                               capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            _stage(f"TPU unreachable after {max_wait_s}s; proceeding anyway")
            return
        _stage(f"TPU backend unavailable (probe {attempt}); retrying...")
        time.sleep(30)


def main():
    import jax

    # the axon tunnel has measured outages of 4+ hours; waiting is strictly
    # better than losing the round's artifact (override via BENCH_WAIT_TPU_S)
    _wait_for_tpu(int(os.environ.get("BENCH_WAIT_TPU_S", 7200)))
    # the package sets a machine-fingerprinted cache dir on import (stale
    # cross-machine XLA:CPU AOT entries abort on deserialize); honor an
    # explicit JAX_CACHE_DIR override only
    if os.environ.get("JAX_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_CACHE_DIR"])
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001 — older jax without these flags
            pass

    dim = int(os.environ.get("BENCH_DIM", 128))
    q = int(os.environ.get("BENCH_Q", 1024))
    # 24 in-jit batches for the graph legs (was 10): the ~40 ms dispatch
    # RTT through the tunnel is 11% of a 35 ms/batch serving-config scan at
    # 10 batches, 4.6% at r4's 86 ms — 24 holds the tax under ~5% for both
    iters = int(os.environ.get("BENCH_ITERS", 24))

    # BENCH_ONLY=n100k|n1m runs one config (lets the full artifact be
    # assembled from two runs when an execution window is capped)
    only = os.environ.get("BENCH_ONLY")
    configs = {}
    if only in (None, "", "n100k"):
        configs["n100k"] = bench_config(
            100_000, dim, q, iters,
            host_build=os.environ.get("BENCH_SKIP_HOST_BUILD") != "1",
        )
    if os.environ.get("BENCH_SKIP_1M") != "1" and only in (None, "", "n1m"):
        configs["n1m"] = bench_config(1_000_000, dim, q, iters, host_build=False)
        # fold the cached sequential-host-build recall comparison into the
        # 1M leg so the artifact is self-exonerating (the 2981 s build is
        # measured once — benchmarks/host_1m_recall.py — not re-run here).
        # Convention: recall_delta = host - device (NEGATIVE = device
        # build BETTER). Same gaussian-1M data class: absolute recall is
        # low for everyone (data hardness); the comparison is the point.
        try:
            with open(os.path.join(os.path.dirname(__file__),
                                   "benchmarks", "host_1m_recall.json")) as f:
                cached = json.load(f)
            for ef in EF_SWEEP:
                leg = configs["n1m"]["graph"].get(f"ef{ef}")
                rh = cached["recall_host_build"].get(f"ef{ef}")
                if leg and rh is not None:
                    leg["recall_host_build_cached"] = rh
                    leg["recall_delta"] = round(
                        rh - leg["recall_device_build"], 4
                    )
            configs["n1m"]["build_host_s_cached"] = cached["build_host_s"]
            configs["n1m"]["recall_delta_convention"] = (
                "host - device; negative = device build better"
            )
        except (OSError, KeyError, json.JSONDecodeError):
            pass

    head = configs["n1m"] if "n1m" in configs else configs["n100k"]
    flat_qps = head["flat"]["qps"]
    cpu = head["cpu_qps_ef64"]
    cpu_exact = head["cpu_exact_scan_qps"]
    summary = {
        "metric": f"flat_search_qps_n{head['n']}_d{dim}",
        "value": flat_qps,
        "unit": "QPS",
        # headline vs_baseline is LIKE-FOR-LIKE: the exact-recall-class flat
        # scan vs the CPU exact scan (same algorithm, same recall). The
        # cross-algorithm flat-vs-CPU-graph ratio (mismatched recall
        # classes) is demoted to a labeled secondary field.
        "vs_baseline": round(flat_qps / cpu_exact, 2),
        "vs_cpu_graph_cross_algo": round(flat_qps / cpu, 2),
        "flat_recall": head["flat"]["recall"],
        "flat_mfu": head["flat"].get("mfu"),
        "graph_qps_ef64": head["graph"]["ef64"]["qps"],
        "graph_recall_ef64": head["graph"]["ef64"]["recall_device_build"],
        "graph_bw_util_ef64": head["graph"]["ef64"]["bw_util"],
        "graph_vs_baseline": round(head["graph"]["ef64"]["qps"] / cpu, 2),
        "build_inserts_per_s": head["build_device_inserts_per_s"],
        "build_mfu": head.get("build_mfu_approx"),
        "peak_tflops_assumed": PEAK_TFLOPS,
        "peak_gbps_assumed": PEAK_GBPS,
        # all vs_* ratios are vs this repo's own native engine (usearch
        # submodule empty in the snapshot; zero egress) — see BASELINE.md
        # "Comparator caveat"; order-of-magnitude, self-refereed
        "cpu_comparator": "self:native/hnsw_engine.cpp",
        "device": str(jax.devices()[0]),
        "full": "bench_full.json",
    }
    if "flat_pq" in head:
        summary["flat_pq_qps"] = head["flat_pq"]["qps"]
        summary["flat_pq_mfu"] = head["flat_pq"].get("mfu")
    for short in (300, 100):
        if f"flat_pq_rerank{short}" in head:
            summary["pq_rerank_recall"] = head[f"flat_pq_rerank{short}"]["recall"]
            summary["pq_rerank_qps"] = head[f"flat_pq_rerank{short}"]["qps"]
            summary["pq_rerank_shortlist"] = short
            break
    if "graph_pq" in head:
        summary["graph_pq_qps_ef64"] = head["graph_pq"]["ef64"]["qps"]
        summary["graph_pq_recall_ef64"] = (
            head["graph_pq"]["ef64"]["recall_vs_f32_truth"]
        )
    # the full per-config tree goes to a side file: r3's summary line grew
    # past the driver's capture window and parsed as null (VERDICT r3 weak
    # #4) — the driver-facing line must stay compact (<= ~1.5 KB) and LAST
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    with open(full_path, "w") as f:
        json.dump({"summary": summary, "configs": configs}, f, indent=1)
    line = json.dumps(summary)
    assert len(line) <= 1536, f"summary line too long ({len(line)} B)"
    print(line)


if __name__ == "__main__":
    main()

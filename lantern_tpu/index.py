"""The user-facing Index facade — the framework's main API surface.

Plays the role of the reference's SQL surface for one index: CREATE INDEX
(build), INSERT (add), DELETE (tombstones), ORDER BY <-> LIMIT k (search),
validate_index, and snapshot persistence. Host builds run on the native C++
engine; queries run batched on TPU; labels are arbitrary u64 external keys
(heap TIDs in the reference).
"""

from __future__ import annotations

import numpy as np

from lantern_tpu.config import HnswParams, Metric, SearchParams
from lantern_tpu.graph.device import join_labels, to_device
from lantern_tpu.graph.search import search_batched
from lantern_tpu.graph.validate import validate
from lantern_tpu.storage.snapshot import InsertLog, load_snapshot, save_snapshot


class ReindexHandle:
    """Handle for an in-flight concurrent reindex (see
    Index.reindex_concurrent). ``join()`` waits for the background rebuild
    and re-raises any build error; ``done`` polls."""

    def __init__(self):
        import threading

        self._done = threading.Event()
        self.exception: BaseException | None = None
        self.swapped = False

    def join(self, timeout: float | None = None) -> bool:
        self._done.wait(timeout)
        if self.exception is not None:
            raise self.exception
        return self.swapped

    @property
    def done(self) -> bool:
        return self._done.is_set()


class Index:
    """A single HNSW vector index: host engine + device mirror.

    >>> ix = Index(HnswParams(dim=128))
    >>> ix.add(vectors)                      # build / ingest
    >>> dists, labels = ix.search(queries)   # batched on device
    """

    def __init__(
        self,
        params: HnswParams,
        capacity: int = 1024,
        seed: int = 0,
        engine: str = "native",
        log_path: str | None = None,
        keep_raw: bool = True,
    ):
        import threading

        self.params = params
        self._engine_kind = engine
        # serializes engine swaps (reindex_concurrent) against mutations;
        # searches read lock-free (stale-but-consistent until the swap)
        self._swap_lock = threading.Lock()
        self._graph_eng = None  # engine the cached device mirror was built from
        if engine == "native":
            from lantern_tpu.native import NativeHnsw

            self._eng = NativeHnsw(params, capacity=capacity, seed=seed)
        elif engine == "python":
            from lantern_tpu.graph.host_build import HostHnsw

            self._eng = HostHnsw(params, capacity=capacity, seed=seed)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        self._graph = None  # cached device mirror
        self._label_sort = None  # cached sorted-label lookup (see rows_for_labels)
        self._codebook = None  # PQCodebook when params.pq
        # host-side raw rows (row-aligned with engine slots) enabling PQ
        # rerank — the analog of the reference's heap table, which keeps
        # full-precision vectors beside the PQ index (quantize_table adds a
        # _pq column; the original column remains). Captured on add() for
        # PQ indexes unless keep_raw=False (host-RAM cost is n*dim*4 B);
        # after load_snapshot, re-supply via set_rerank_source. Chunked so
        # streaming ingest appends O(1), concatenated lazily at search.
        self._keep_raw = keep_raw
        self._rerank_chunks: list[np.ndarray] = []
        self._rerank_rows = None  # cached concatenation of the chunks
        self._rerank_dev = None  # cached device (bf16 rows, f32 sq_norms)
        # calibrated shortlist depth for rerank="auto":
        # (depth, coverage, size_at_calibration) — see calibrate_rerank
        self._rerank_auto = None
        self._log = None
        if log_path:
            import os

            width = self._eng.vectors.shape[1]
            dtype = self._eng.vectors.dtype
            if os.path.exists(log_path) and os.path.getsize(log_path) > 0:
                # crash BEFORE the first save(): no snapshot exists, the WAL
                # is the only copy of fsync-acknowledged inserts — replay it
                # into the fresh engine. (Adopting the log's count without
                # replaying would stamp those records as folded on the next
                # save() and truncate() would destroy them.)
                self._apply_log_ops(
                    InsertLog.replay_ops(log_path, width, dtype)
                )
            self._log = InsertLog(log_path, width, dtype)

    def _apply_log_ops(self, ops):
        """Apply WAL ops in order (adds batched between tombstones).
        Caller must ensure self._log is None/detached so nothing re-logs."""
        pend_v, pend_l = [], []

        def _flush():
            if pend_v:
                self.add(np.stack(pend_v), np.array(pend_l, np.uint64))
                pend_v.clear()
                pend_l.clear()

        for op in ops:
            if op[0] == "add":
                pend_v.append(op[2])
                pend_l.append(op[1])
            else:
                _flush()
                self._eng.mark_deleted(np.array([op[1]], np.uint64))
        _flush()
        self._graph = None

    # ---- PQ (create_pq_codebook / quantize_table analog) ----
    def train_pq(self, training_data: np.ndarray, iters: int = 25, seed: int = 0,
                 rotate: bool = False, opq_iters: int = 16):
        """Train the PQ codebook (required before add when params.pq).

        ``rotate=True`` learns an OPQ rotation jointly (same code bytes,
        lower quantization error on correlated data — quant/pq.PQCodebook).
        """
        if not self.params.pq:
            raise ValueError("index was not created with pq=True")
        from lantern_tpu.quant.pq import train_codebook

        self._codebook = train_codebook(
            np.asarray(training_data, np.float32),
            num_subvectors=self.params.effective_num_subvectors,
            num_centroids=self.params.num_centroids,
            iters=iters,
            seed=seed,
            rotate=rotate,
            opq_iters=opq_iters,
        )
        return self._codebook

    def _preprocess(self, vectors: np.ndarray) -> np.ndarray:
        """Apply storage quantization before graph construction, so the host
        graph is built over the same representation the device searches
        (the reference quantizes inside usearch at insert time)."""
        from lantern_tpu.config import QuantKind

        vectors = np.asarray(vectors)
        if self.params.pq:
            if self._codebook is None:
                # auto-train on the first batch (reference requires an explicit
                # create_pq_codebook first; auto-training is a convenience)
                self.train_pq(vectors)
            from lantern_tpu.quant.pq import pq_decode, pq_encode

            return pq_decode(pq_encode(vectors, self._codebook), self._codebook)
        if self.params.quant == QuantKind.I8:
            from lantern_tpu.quant.scalar import dequantize_i8, quantize_i8

            codes, scales = quantize_i8(np.asarray(vectors, np.float32))
            return np.asarray(dequantize_i8(codes, scales))
        if self.params.quant == QuantKind.B1:
            from lantern_tpu.quant.scalar import binarize

            if vectors.dtype == np.uint32:
                return vectors  # already packed
            return np.asarray(binarize(np.asarray(vectors, np.float32)))
        return vectors

    # ---- ingest ----
    def add(self, vectors: np.ndarray, labels: np.ndarray | None = None,
            build: str = "host", batch: int = 1024, seed: int = 0, **kw):
        """Ingest vectors. ``build="host"`` inserts through the native engine
        (the reference's in-process path); ``build="device"`` runs on the
        TPU: an empty index takes the bulk builder (graph/build_device,
        10-14x the sequential host rate), a non-empty one takes
        device_insert's batched insert rounds against the live graph —
        either way the result is imported back into the engine, the facade
        analog of the reference's external build streaming the finished
        index back into the store (build.c:523-552, external_index.c:240).
        Host inserts remain the right choice for trickle adds (a device
        round-trip per tiny batch is tunnel-latency-bound)."""
        raw = (
            np.asarray(vectors, np.float32)
            if self.params.pq and self._keep_raw else None
        )
        vectors = self._preprocess(vectors)
        with self._swap_lock:
            return self._add_locked(vectors, labels, build, batch, seed, raw,
                                    **kw)

    def _add_locked(self, vectors, labels, build, batch, seed, raw, **kw):
        if labels is None:
            labels = np.arange(self.size, self.size + len(vectors), dtype=np.uint64)
        if build == "device":
            if self._engine_kind != "native":
                raise ValueError("build='device' requires the native engine")
            if self.size == 0:
                from lantern_tpu.graph.build_device import build_on_device

                g = build_on_device(
                    np.asarray(vectors), self.params, batch=batch, seed=seed,
                    labels=np.asarray(labels, np.uint64),
                    **{k: kw[k] for k in ("candidates", "flat_until", "store")
                       if k in kw},
                )
                need = len(vectors)
                if need > self._eng._cap:
                    self._grow(need)
                self._eng.import_graph(g, labels=np.asarray(labels, np.uint64))
            else:
                # device-speed incremental ingest (VERDICT r3 #9): run the
                # batched insert rounds against a device view of the LIVE
                # graph (graph geometry = the engine's stored rows, already
                # quantization-preprocessed), then adopt the result back —
                # the same import path the bulk build uses. ~10-30x the
                # 1-core host engine's insert rate for large batches; the
                # reference's aminsert has no such mode (insert.c is
                # CPU-per-tuple), its fast path is an external rebuild
                # (server.rs:377-434).
                from lantern_tpu.graph.build_device import device_insert

                g2 = device_insert(
                    to_device(self._eng), np.asarray(vectors),
                    labels=np.asarray(labels, np.uint64),
                    batch=batch, seed=seed,
                    ef_construction=self.params.ef_construction,
                    **{k: kw[k] for k in ("candidates", "flat_until")
                       if k in kw},
                )
                need = int(g2.num_nodes)
                if need > self._eng._cap:
                    self._grow(need)
                self._eng.import_graph(g2)
        else:
            if self._engine_kind == "native":
                # grow capacity ahead of need (usearch_reserve doubling)
                need = self._eng.n + len(vectors)
                if need > self._eng._cap:
                    self._grow(need)
            self._eng.add(vectors, labels=labels, **kw)
        if self._log is not None:
            self._log.append(np.asarray(vectors, self._eng.vectors.dtype), labels)
        if raw is not None:
            self._rerank_chunks.append(raw)
            self._rerank_rows = None  # invalidate the cached concat
            self._rerank_dev = None
        self._graph = None
        return self

    def set_rerank_source(self, rows: np.ndarray):
        """Supply full-precision rows (row-aligned with engine slots) for
        PQ rerank — needed after load_snapshot, where only codes persist
        (the reference's raw rows live in the heap table, outside the
        index file)."""
        rows = np.asarray(rows, np.float32)
        if len(rows) != self.size:
            raise ValueError(
                f"rerank source has {len(rows)} rows, index has {self.size}"
            )
        self._rerank_chunks = [rows]
        self._rerank_rows = rows
        self._rerank_dev = None
        return self

    @property
    def _raw_rows(self) -> np.ndarray | None:
        """Concatenated rerank source (cached; chunks append O(1))."""
        if self._rerank_rows is None and self._rerank_chunks:
            self._rerank_rows = (
                self._rerank_chunks[0] if len(self._rerank_chunks) == 1
                else np.concatenate(self._rerank_chunks)
            )
            self._rerank_chunks = [self._rerank_rows]
        return self._rerank_rows

    def _grow(self, need: int):
        """Rebuild-free capacity growth (usearch_reserve doubling).

        Native engine only: both call sites guard on the engine kind (the
        python engine's add() grows its own arrays via _reserve)."""
        from lantern_tpu.native import NativeHnsw

        if not isinstance(self._eng, NativeHnsw):
            raise TypeError("_grow is a native-engine operation")
        new_cap = max(8, self._eng._cap)
        while new_cap < need:
            new_cap *= 2
        self._eng.grow(new_cap)  # in-place realloc — no disk round trip
        # the realloc frees the buffers any cached device mirror may alias
        # (zero-copy views on the CPU backend) — drop it
        self._graph = None
        self._label_sort = None

    def delete(self, labels: np.ndarray) -> int:
        """Tombstone by label; no space reclamation (delete.c:24-25 parity;
        compact() reclaims). With a log attached the tombstones are WAL'd
        (the reference's delete runs under GenericXLog, delete.c:40-70), so
        deletes survive a crash before the next save()."""
        labels = np.asarray(labels, np.uint64)
        with self._swap_lock:
            n = self._eng.mark_deleted(labels)
            if self._log is not None:
                self._log.append_delete(labels)
            self._graph = None
        return n

    # ---- query ----
    @property
    def device_graph(self):
        # identity-keyed on the engine: a concurrent reindex swap invalidates
        # the mirror even if a racing search caches one mid-swap
        eng = self._eng
        if self._graph is None or self._graph_eng is not eng:
            from lantern_tpu.config import QuantKind

            if self.params.pq:
                g = to_device(eng, pq_codebook=self._codebook)
            elif self.params.quant == QuantKind.I8:
                g = to_device(eng, quant=QuantKind.I8)
            elif self.params.quant == QuantKind.F16:
                import jax.numpy as jnp

                g = to_device(eng, dtype=jnp.bfloat16)
            else:
                g = to_device(eng)
            from lantern_tpu.graph.device import with_aug_norms

            self._graph = with_aug_norms(g)
            self._graph_eng = eng
        return self._graph

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        ef: int | None = None,
        params: SearchParams | None = None,
        mode: str = "auto",
        recall_target: float = 0.95,
        rerank: int | str | None = None,
        with_stats: bool = False,
        allow_labels: np.ndarray | None = None,
        deny_labels: np.ndarray | None = None,
    ):
        """Batched device search -> (dists [Q,k] f32, labels [Q,k] u64).

        Missing results (unreachable/tombstoned) have dist=+inf, label=0.

        ``mode``: 'flat' = dense MXU scan (the TPU fast path — see flat.py),
        'graph' = batched HNSW beam search, 'auto' = cost-model dispatch
        (the planner's seq-scan-vs-index choice, hnsw.c:150-209 analog).

        ``rerank``: PQ indexes only — retrieve a shortlist of this size by
        ADC scan, then re-score it on DEVICE against a bf16 HBM copy of the
        full-precision rows (captured at add() or via set_rerank_source),
        all in one dispatch. Recovers full-precision recall (to bf16
        rounding) at code-bytes scan cost. Pass ``rerank="auto"`` to size
        the shortlist from measured ADC coverage on a sample of stored rows
        (calibrated once per index via calibrate_rerank; re-calibrated
        after >2x growth) — on clustered/high-d data a fixed depth silently
        caps recall (BASELINE.md pq_960 story).

        ``with_stats=True`` appends a stats dict describing the executed
        plan — the ``lantern.masked_explain`` analog (lantern.sql:858-901):
        the chosen mode plus, for graph traversal, per-query visited /
        expanded counts from search_batched.

        ``allow_labels`` / ``deny_labels``: predicate-filtered search (the
        reference relies on the executor filtering rows above the index
        scan + streaming k-doubling). The flat path filters exactly (one
        fused select on the score block — free on the MXU); the graph path
        drops filtered nodes at emit time like tombstones, so raise ``ef``
        under heavy filtering.
        """
        if params is not None:
            k, ef = params.k, params.ef
        ef = ef or self.params.ef
        # multi-seed entries (SearchParams.seeds): recall-positive at every
        # measured budget; seeds=1 restores single-entry semantics
        seeds = params.seeds if params is not None else SearchParams().seeds
        import jax.numpy as jnp

        from lantern_tpu.config import QuantKind

        queries = np.atleast_2d(np.asarray(queries))
        if self.params.quant == QuantKind.B1 and queries.dtype != np.uint32:
            from lantern_tpu.quant.scalar import binarize

            queries = np.asarray(binarize(np.asarray(queries, np.float32)))
        q = jnp.asarray(queries)
        graph = self.device_graph
        n = self._eng.n  # host-side count (device fetches ride a slow tunnel)
        exclude = None
        if allow_labels is not None or deny_labels is not None:
            mask = np.zeros(int(graph.cap), bool)
            if allow_labels is not None:
                rows = self.rows_for_labels(allow_labels)
                mask[:] = True
                mask[rows[rows >= 0]] = False
            if deny_labels is not None:
                rows = self.rows_for_labels(deny_labels)
                mask[rows[rows >= 0]] = True
            exclude = jnp.asarray(mask)
        if rerank is not None:
            if rerank == "auto":
                rerank = self._auto_rerank_depth(k)
            out = self._search_rerank(q, k, rerank, recall_target, exclude)
            if with_stats:
                return (*out, {"mode": "flat_pq_rerank", "shortlist": rerank,
                               "rows_scanned": n})
            return out
        if mode == "auto":
            from lantern_tpu.costmodel import choose_search_strategy

            mode = choose_search_strategy(
                n, graph.vectors.shape[1],
                graph.vectors.dtype.itemsize, quant_is_pq=self.params.pq,
            )
        stats = {"mode": mode}
        if mode == "flat":
            from lantern_tpu.flat import flat_search_graph

            # exact top-k below ~128k rows (negligible cost, deterministic);
            # approx_max_k at recall_target above
            exact = n <= (1 << 17)
            d, ids, labels = flat_search_graph(
                graph, q, k=k, exact=exact,
                recall_target=recall_target, exclude=exclude,
            )
            stats.update(rows_scanned=n, exact_topk=exact)
        elif mode == "graph":
            if with_stats:
                d, ids, labels, gstats = search_batched(
                    graph, q, k=k, ef=max(ef, k), with_stats=True,
                    exclude=exclude, seeds=seeds,
                )
                stats.update({k2: np.asarray(v) for k2, v in gstats.items()},
                             ef=max(ef, k))
            else:
                d, ids, labels = search_batched(graph, q, k=k, ef=max(ef, k),
                                                exclude=exclude, seeds=seeds)
        else:
            raise ValueError(f"unknown search mode {mode!r}")
        res = np.asarray(d), join_labels(np.asarray(labels))
        return (*res, stats) if with_stats else res

    def _auto_rerank_depth(self, k: int) -> int:
        """Resolve rerank="auto": calibrate once, recalibrate if the index
        grew >2x since (coverage degrades as clusters grow past the
        shortlist — the exact 960-d failure mode, BASELINE.md r4)."""
        if (
            self._rerank_auto is None
            or self.size > 2 * max(self._rerank_auto[2], 1)
        ):
            self.calibrate_rerank(k=k)
        return self._rerank_auto[0]

    def calibrate_rerank(
        self,
        k: int = 10,
        sample: int = 256,
        target: float = 0.99,
        ladder: tuple[int, ...] = (100, 300, 600, 1200, 2400),
        recall_target: float = 0.95,
        seed: int = 0,
    ) -> dict:
        """Size the PQ rerank shortlist from MEASURED ADC coverage.

        The recall of two-stage PQ search is capped by shortlist coverage:
        P(true top-k id appears in the ADC top-``shortlist``). On clustered
        data a fixed default (300) silently caps recall — at 960 d the
        default-looking rerank300 reads 0.83 while rerank600 reads 0.97
        (BASELINE.md, pq_960_result.json). The reference's own answer to "a
        too-shallow shortlist" is the growing-k re-search (scan.c:240-292);
        here the depth is picked ONCE from data instead, so the steady-state
        path stays a single two-stage dispatch.

        Method: ``sample`` stored rows are drawn as queries (stored rows
        reproduce the cluster structure that floods shortlists); their true
        top-k comes from an exact f32 HIGHEST-precision scan of the rerank
        source (never the default matmul — CLAUDE.md measurement
        discipline); coverage@S is measured through the SAME approx ADC
        retrieval the production path uses. The smallest ladder entry with
        coverage >= ``target`` wins; if none reaches it, the deepest entry
        is used and a warning is logged.

        Returns {"depth", "coverage", "coverages", "sample", "k"} and caches
        the depth for ``search(rerank="auto")``.
        """
        if not self.params.pq:
            raise ValueError("calibrate_rerank applies to PQ indexes only")
        rows = self._raw_rows
        if rows is None:
            raise ValueError(
                "no rerank source: rows are captured by add(), or supply "
                "them after load via set_rerank_source()"
            )
        import jax.numpy as jnp

        from lantern_tpu.flat import flat_search, flat_search_pq

        n = self.size
        sample = min(sample, n)
        ladder = tuple(s for s in ladder if s >= k) or (max(ladder),)
        smax = min(max(ladder), n)
        rng = np.random.default_rng(seed)
        qrows = rows[rng.choice(n, size=sample, replace=False)]
        q = jnp.asarray(qrows, jnp.float32)

        # exact truth on the f32 source rows (HIGHEST precision inside
        # flat_search(exact=True) since r4)
        vecs = jnp.asarray(rows, jnp.float32)
        sqn = jnp.asarray(
            np.einsum("nd,nd->n", rows, rows).astype(np.float32)
        )
        g = self.device_graph
        dele = g.deleted[: n] if bool(np.asarray(g.deleted[:n]).any()) else None
        _, true_ids = flat_search(
            vecs, sqn, q, k=k, metric=int(self.params.metric),
            exact=True, deleted=dele,
        )
        true_np = np.asarray(true_ids)
        del vecs, sqn

        # ADC shortlist through the production retrieval (approx top-k at
        # the same recall_target the search path uses)
        _, sl_ids = flat_search_pq(
            g.vectors[:n], g.pq_codebook, q, k=smax,
            metric=int(self.params.metric), recall_target=recall_target,
            deleted=dele, rotation=g.pq_rotation,
        )
        sl_np = np.asarray(sl_ids)

        # rank of each true id within the shortlist (absent -> +inf)
        pos = np.full(true_np.shape, np.inf)
        for i in range(sample):
            where = {int(v): j for j, v in enumerate(sl_np[i]) if v >= 0}
            for t in range(true_np.shape[1]):
                tid = int(true_np[i, t])
                if tid in where:
                    pos[i, t] = where[tid]
        coverages = {s: float((pos < min(s, smax)).mean()) for s in ladder}
        depth = next(
            (s for s in ladder if coverages[s] >= target), max(ladder)
        )
        if coverages[depth] < target:
            from lantern_tpu.utils.logger import Logger

            Logger("index").warn(
                f"rerank auto-calibration: coverage@{depth} = "
                f"{coverages[depth]:.4f} < target {target}; recall will be "
                f"capped — consider more subvectors or a deeper ladder"
            )
        self._rerank_auto = (int(depth), coverages[depth], n)
        return {
            "depth": int(depth),
            "coverage": round(coverages[depth], 4),
            "coverages": {str(s): round(c, 4) for s, c in coverages.items()},
            "sample": sample,
            "k": k,
        }

    def _search_rerank(self, q, k: int, shortlist: int, recall_target: float,
                       exclude=None):
        """ADC-shortlist flat scan + exact rerank ON DEVICE (see search).

        The full-precision rows are cached in HBM as bf16 (half the f32
        copy; returned distances are true metric distances to bf16
        precision), and the shortlist gather + rescoring einsum run in the
        same jitted program as the ADC scan — one dispatch per query batch
        instead of a host round-trip between the stages.
        """
        if not self.params.pq:
            raise ValueError("rerank= applies to PQ indexes only")
        metric = Metric(self.params.metric)
        if metric not in (Metric.L2SQ, Metric.COS):
            raise ValueError("rerank supports l2sq/cos")
        rows = self._raw_rows
        if rows is None:
            raise ValueError(
                "no rerank source: rows are captured by add(), or supply "
                "them after load via set_rerank_source()"
            )
        if len(rows) != self.size:
            # e.g. rows added after load_snapshot: only the post-load rows
            # were captured, so slot ids would silently index into the wrong
            # rows — refuse rather than rerank against misaligned data
            raise ValueError(
                f"rerank source has {len(rows)} rows but the index has "
                f"{self.size}; supply the full slot-aligned rows via "
                "set_rerank_source()"
            )
        import jax.numpy as jnp

        from lantern_tpu.flat import flat_search_graph_rerank

        if self._rerank_dev is None or self._rerank_dev[0].shape[0] != len(rows):
            self._rerank_dev = (
                jnp.asarray(rows, jnp.bfloat16),
                jnp.asarray(
                    np.einsum("nd,nd->n", rows, rows).astype(np.float32)
                ),
            )
        d, _, labels = flat_search_graph_rerank(
            self.device_graph, *self._rerank_dev, q, k=k,
            shortlist=max(shortlist, k), recall_target=recall_target,
            exclude=exclude,
        )
        return np.asarray(d), join_labels(np.asarray(labels))

    # static (k, ef) program tiers for the streaming scan: every streaming
    # call compiles AT MOST these three beam programs per graph shape —
    # through this environment's 30-90 s compile tunnel, the reference's
    # literal k-doubling ladder (10 -> 20 -> ... -> 1000, scan.c:240-292,
    # each step a fresh XLA program) would cost minutes per doubling; a
    # warm cache re-searches with zero compiles.
    STREAM_TIERS = (64, 256, 1000)

    def search_streaming(self, query: np.ndarray, ef: int | None = None,
                         init_k: int = 10):
        """Generator yielding (dist, label) in ascending order, re-searching
        with a larger k whenever the consumer wants more rows — the
        reference's streaming scan semantics (scan.c:240-292: start at
        lantern_hnsw.init_k, grow on exhaustion, hard stop at 1000), with
        k quantized to the static STREAM_TIERS so the jit cache is bounded
        (<= 1 new compile per tier REACHED, ever, per graph shape).
        """
        from lantern_tpu.config import LDB_SCAN_K_MAX

        tiers = [t for t in self.STREAM_TIERS if t >= init_k]
        if not tiers:
            tiers = [LDB_SCAN_K_MAX]
        seen: set[int] = set()
        for k in tiers:
            k = min(k, LDB_SCAN_K_MAX)
            # graph mode: deterministic beam (the reference's streaming IS
            # the graph scan, scan.c:240-292). The flat path's approx_max_k
            # does not guarantee prefix stability across re-searches with a
            # different k, which would duplicate/skip rows; the label
            # dedup below is belt-and-braces on top.
            d, labels = self.search(query, k=k,
                                    ef=max(ef or self.params.ef, k),
                                    mode="graph")
            rows = [
                (float(dd), int(ll))
                for dd, ll in zip(d[0], labels[0])
                if np.isfinite(dd)
            ]
            for row in rows:
                if row[1] not in seen:
                    seen.add(row[1])
                    yield row
            if k >= LDB_SCAN_K_MAX or len(rows) < k:
                return  # exhausted the reachable live set or hit the cap

    def rows_for_labels(self, labels: np.ndarray) -> np.ndarray:
        """Vectorized label -> internal-row resolution; -1 for unknown labels.

        Backed by a cached sorted-label array rebuilt only when the node
        count changes — O(n log n) once, O(m log n) per call (the per-query
        python-dict rebuild this replaces was O(n) per weighted-search
        column, unusable at 1M).
        """
        n = self._eng.n
        if self._label_sort is None or self._label_sort[2] != n:
            lab = np.asarray(self._eng.labels[:n]).copy()
            order = np.argsort(lab, kind="stable").astype(np.int64)
            self._label_sort = (lab[order], order, n)
        slab, order, _ = self._label_sort
        labels = np.atleast_1d(np.asarray(labels, np.uint64))
        if len(slab) == 0:
            return np.full(len(labels), -1, np.int64)
        idx = np.minimum(np.searchsorted(slab, labels), len(slab) - 1)
        return np.where(slab[idx] == labels, order[idx], -1)

    def search_cpu(self, query: np.ndarray, k: int = 10, ef: int | None = None):
        """Single-query search on the host engine (reference execution model)."""
        ids, d = self._eng.search(np.asarray(query), k=k, ef=ef or self.params.ef)
        return d, self._eng.labels[ids] if len(ids) else np.empty(0, np.uint64)

    # ---- maintenance ----
    def validate(self, full: bool = True):
        return validate(self._eng, full=full)

    def compact(self, params: HnswParams | None = None, build: str = "host",
                batch: int = 1024, seed: int = 0, **kw) -> "Index":
        """Rebuild the index without its tombstoned nodes, reclaiming their
        graph slots and HBM — the maintenance operation the reference
        explicitly lacks (delete.c:24-25 WARNs that deleted tuples are
        tombstoned forever; its only recourse is a full ``REINDEX``).

        ``params`` optionally re-parametrizes the graph (new m /
        ef_construction / ef — the ``REINDEX``-with-new-options analog);
        dim, metric, and quantization must match the existing index since
        stored vectors are reused as-is. ``build`` selects the host engine
        or the TPU bulk builder (``"device"``, native engine only).
        In-memory only: call save() afterwards to persist.
        """
        from lantern_tpu.config import QuantKind

        p = self.params if params is None else params
        for field in ("dim", "metric", "quant", "pq"):
            if getattr(p, field) != getattr(self.params, field):
                raise ValueError(
                    f"compact cannot change {field} "
                    f"({getattr(self.params, field)!r} -> {getattr(p, field)!r}); "
                    "stored vectors would need re-quantization — rebuild from "
                    "the raw rows instead"
                )
        n = self._eng.n
        live = ~np.asarray(self._eng.deleted[:n], bool)
        vecs = np.asarray(self._eng.vectors[:n])[live]
        labs = np.asarray(self._eng.labels[:n])[live].astype(np.uint64)
        n_live = int(live.sum())
        cap = max(8, n_live)
        if self._engine_kind == "native":
            from lantern_tpu.native import NativeHnsw

            new_eng = NativeHnsw(p, capacity=cap, seed=seed)
        else:
            from lantern_tpu.graph.host_build import HostHnsw

            new_eng = HostHnsw(p, capacity=cap, seed=seed)
        if n_live:
            if build == "device":
                if self._engine_kind != "native":
                    raise ValueError("build='device' requires the native engine")
                from lantern_tpu.graph.build_device import build_on_device

                g = build_on_device(
                    vecs, p, batch=batch, seed=seed, labels=labs,
                    **{k: kw[k] for k in ("candidates", "flat_until", "store")
                       if k in kw},
                )
                new_eng.import_graph(g, labels=labs)
            elif build == "host":
                # vectors are already quantized/preprocessed representations;
                # insert them directly (re-running _preprocess would be
                # idempotent for i8/bf16 but wasteful, and wrong for B1)
                new_eng.add(vecs, labels=labs, **kw)
            else:
                raise ValueError(f"unknown build {build!r}")
        self._eng = new_eng
        self.params = p
        self._graph = None
        self._label_sort = None
        if self._raw_rows is not None:
            rows = self._raw_rows[live] if len(self._raw_rows) == n else None
            self._rerank_chunks = [rows] if rows is not None else []
            self._rerank_rows = rows
            self._rerank_dev = None
        return self

    def reindex(self, params: HnswParams, build: str = "host", **kw) -> "Index":
        """Rebuild with new graph parameters (REINDEX analog; also drops
        tombstones — see compact())."""
        return self.compact(params=params, build=build, **kw)

    def reindex_concurrent(self, params: HnswParams | None = None,
                           build: str = "host", batch: int = 1024,
                           seed: int = 0, **kw) -> ReindexHandle:
        """``REINDEX CONCURRENTLY`` analog (hnsw_concurrent.sql:1-15):
        rebuild without tombstones in a BACKGROUND thread and atomically
        swap the engine in.

        Searches keep running against the old graph throughout
        (stale-but-consistent until the swap — the reference's concurrent
        reindex likewise serves the old index until the transactional
        swap), and add()/delete() traffic that lands during the rebuild is
        replayed into the new engine under the swap lock before it goes
        live, so no acknowledged write is lost.

        Threading contract: any number of search threads; at most ONE
        writer thread issuing add/delete/save concurrently with the
        rebuild (the facade is not a multi-writer structure — neither is
        the reference's insert path, which serializes on the header page
        lock, insert.c:103-110).

        Returns a ReindexHandle; ``join()`` re-raises rebuild errors.
        In-memory only: call save() afterwards to persist.
        """
        import threading

        p = self.params if params is None else params
        for field in ("dim", "metric", "quant", "pq"):
            if getattr(p, field) != getattr(self.params, field):
                raise ValueError(
                    f"reindex_concurrent cannot change {field}; rebuild "
                    "from the raw rows instead"
                )
        if build == "device" and self._engine_kind != "native":
            raise ValueError("build='device' requires the native engine")
        old_eng = self._eng
        with self._swap_lock:
            n0 = old_eng.n
            live0 = ~np.asarray(old_eng.deleted[:n0], bool)
            vecs0 = np.asarray(old_eng.vectors[:n0])[live0].copy()
            labs0 = np.asarray(old_eng.labels[:n0])[live0].astype(np.uint64)
        handle = ReindexHandle()

        def work():
            try:
                n_live = len(labs0)
                cap = max(8, n_live)
                if self._engine_kind == "native":
                    from lantern_tpu.native import NativeHnsw

                    new_eng = NativeHnsw(p, capacity=cap, seed=seed)
                else:
                    from lantern_tpu.graph.host_build import HostHnsw

                    new_eng = HostHnsw(p, capacity=cap, seed=seed)
                if n_live:
                    if build == "device":
                        from lantern_tpu.graph.build_device import (
                            build_on_device,
                        )

                        g = build_on_device(
                            vecs0, p, batch=batch, seed=seed, labels=labs0,
                            **{k: kw[k] for k in
                               ("candidates", "flat_until", "store")
                               if k in kw},
                        )
                        new_eng.import_graph(g, labels=labs0)
                    else:
                        new_eng.add(vecs0, labels=labs0, **kw)
                # swap: replay writes that landed during the rebuild, then
                # publish the new engine — brief, under the writer lock
                with self._swap_lock:
                    n1 = old_eng.n
                    dead1 = np.asarray(old_eng.deleted[:n1], bool)
                    keep_delta = None
                    if n1 > n0:
                        keep_delta = ~dead1[n0:n1]
                        add_v = np.asarray(
                            old_eng.vectors[n0:n1])[keep_delta]
                        add_l = np.asarray(
                            old_eng.labels[n0:n1])[keep_delta].astype(
                                np.uint64)
                        if len(add_l):
                            if self._engine_kind == "native":
                                need = new_eng.n + len(add_l)
                                if need > new_eng._cap:
                                    nc = max(8, new_eng._cap)
                                    while nc < need:
                                        nc *= 2
                                    new_eng.grow(nc)
                            new_eng.add(add_v, labels=add_l)
                    newly_dead = labs0[dead1[:n0][live0]]
                    if len(newly_dead):
                        new_eng.mark_deleted(newly_dead)
                    # rerank source: new slot order = live0 rows then the
                    # kept delta rows, both in old slot order
                    rows = self._raw_rows
                    if rows is not None and len(rows) == n1:
                        idx = np.concatenate([
                            np.nonzero(live0)[0],
                            (n0 + np.nonzero(keep_delta)[0])
                            if keep_delta is not None
                            else np.empty(0, np.int64),
                        ])
                        new_rows = rows[idx]
                        self._rerank_chunks = [new_rows]
                        self._rerank_rows = new_rows
                        self._rerank_dev = None
                    self._eng = new_eng
                    self.params = p
                    self._graph = None
                    self._label_sort = None
                    handle.swapped = True
                # keep the retired engine reachable until the handle dies:
                # an in-flight search may still hold views over it
                handle._retired = old_eng
            except BaseException as e:  # surfaced by join()
                handle.exception = e
            finally:
                handle._done.set()

        threading.Thread(target=work, name="lantern-reindex",
                         daemon=True).start()
        return handle

    @property
    def size(self) -> int:
        return self._eng.n

    @property
    def num_deleted(self) -> int:
        return int(np.asarray(self._eng.deleted[: self._eng.n]).sum())

    # ---- persistence ----
    def save(self, path: str):
        cb = self._codebook  # PQCodebook (rotation persisted too) or None
        # the snapshot records which log records it folds in (generation +
        # lsn) so a crash before the truncate below can't replay them twice
        log_state = self._log.state if self._log is not None else None
        save_snapshot(self._eng, path, pq_codebook=cb, log_state=log_state)
        if self._log is not None:
            from lantern_tpu.utils.failpoints import failure_point

            # crash site: snapshot durable but log not yet truncated — replay
            # must skip the folded records via the header's (generation, lsn)
            failure_point("index_save", "before_log_truncate")
            self._log.truncate()

    @classmethod
    def load(cls, path: str, engine: str = "native", extra_capacity: int = 1024,
             log_path: str | None = None) -> "Index":
        eng, cb, log_state = load_snapshot(
            path, engine=engine, extra_capacity=extra_capacity,
            return_codebook=True, return_log_state=True,
        )
        import threading

        ix = cls.__new__(cls)
        ix.params = eng.p
        ix._loaded_log_state = log_state  # (generation, lsn) the snapshot folds
        ix._swap_lock = threading.Lock()
        ix._graph_eng = None
        ix._engine_kind = engine
        ix._eng = eng
        ix._graph = None
        ix._label_sort = None
        ix._codebook = None
        # raw rows don't persist in the snapshot; set_rerank_source re-arms
        ix._keep_raw = True
        ix._rerank_chunks = []
        ix._rerank_rows = None
        ix._rerank_dev = None
        if cb is not None:
            ix._codebook = cb  # load_snapshot returns a PQCodebook
        ix._log = None
        if log_path:
            import os

            width = eng.vectors.shape[1]
            if os.path.exists(log_path):
                # the log is truncated on every save(); if a crash landed
                # between snapshot rename and truncate, the snapshot's
                # (generation, lsn) filters the already-folded records.
                # Ops apply IN ORDER (adds batched between tombstones) so
                # interleaved insert/delete sequences replay faithfully.
                ix._apply_log_ops(InsertLog.replay_ops(
                    log_path, width, eng.vectors.dtype, snapshot_state=log_state
                ))
            ix._log = InsertLog(log_path, width, eng.vectors.dtype)
        return ix

    @classmethod
    def follow(cls, path: str, log_path: str, engine: str = "native",
               params: HnswParams | None = None):
        """Open a read-only, log-following replica of another process's
        index (snapshot + live insert log) — the WAL-replica analog
        (scripts/test_wal.py:8-40). Returns an IndexFollower whose
        ``catchup()`` applies newly durable writer records; safe while the
        writer is mid-append (torn tails read as "not yet")."""
        from lantern_tpu.storage.replica import IndexFollower

        return IndexFollower(path, log_path, engine=engine, params=params)

    def __repr__(self):
        return (
            f"Index(n={self.size}, dim={self.params.dim}, m={self.params.m}, "
            f"metric={Metric(self.params.metric).name}, engine={self._engine_kind})"
        )

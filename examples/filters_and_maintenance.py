"""Filtered search, hybrid dense+BM25 retrieval, and index maintenance
(compact / reindex) — the capabilities layered above plain k-NN.

Run: python examples/filters_and_maintenance.py  (any backend; ~10 s on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# this environment pre-pins a TPU platform at interpreter start; honor a
# JAX_PLATFORMS=cpu request before any device query
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lantern_tpu import HnswParams, Index

N = int(os.environ.get("EXAMPLE_N", 3000))
DIM = 32

rng = np.random.default_rng(7)
vectors = rng.standard_normal((N, DIM)).astype(np.float32)
ix = Index(HnswParams(dim=DIM, m=8, ef_construction=64), capacity=N)
ix.add(vectors)

# ---- predicate-filtered search -------------------------------------------
# deny-list: hide specific labels from the results (exact on the flat path)
q = vectors[42]
d, labels = ix.search(q, k=5, deny_labels=np.array([42], np.uint64))
assert 42 not in labels[0].tolist()
print("deny-filtered top-1:", labels[0, 0])

# allow-list: restrict the search to a candidate subset
allow = np.arange(1000, 1100, dtype=np.uint64)
d, labels = ix.search(q, k=5, allow_labels=allow)
assert set(labels[0][np.isfinite(d[0])].tolist()) <= set(allow.tolist())
print("allow-filtered results:", labels[0].tolist())

# ---- executed-plan introspection (masked_explain analog) -------------------
d, labels, stats = ix.search(q, k=5, with_stats=True)
print("plan:", stats["mode"], {k: v for k, v in stats.items() if k != "mode"})

# ---- hybrid dense + lexical retrieval (RRF) --------------------------------
from lantern_tpu.text.bm25 import Bm25Index
from lantern_tpu.weighted import hybrid_search

docs = {i: f"document {i} about topic {i % 7}" for i in range(50)}
docs[3] = "tpu pallas kernels and systolic arrays"
bm = Bm25Index()
bm.add_documents(docs)
small = Index(HnswParams(dim=DIM, m=8, ef_construction=32), capacity=64)
small.add(vectors[:50], labels=np.arange(50, dtype=np.uint64))
scores, labels = hybrid_search(small, bm, vectors[3], "pallas kernels", k=3)
assert labels[0] == 3
print("hybrid top:", labels.tolist())

# ---- maintenance: tombstone reclaim (beyond the reference) ------------------
ix.delete(np.arange(0, N // 2, dtype=np.uint64))
print("tombstoned:", ix.num_deleted)
ix.compact()  # rebuild without the dead nodes (host engine; build="device" on TPU)
assert ix.num_deleted == 0 and ix.size == N - N // 2
ix.validate().raise_if_failed()
print("after compact:", ix)

# reindex with different graph parameters (REINDEX-with-options analog)
import dataclasses

ix.reindex(dataclasses.replace(ix.params, m=12, ef_construction=96))
print("after reindex:", ix)
print("OK")

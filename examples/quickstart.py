"""Quickstart: build an index, search it, persist it.

Run: python examples/quickstart.py  (any backend; ~10 s on CPU)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# this environment pre-pins a TPU platform at interpreter start; honor a
# JAX_PLATFORMS=cpu request before any device query
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lantern_tpu import HnswParams, Index

N = int(os.environ.get("EXAMPLE_N", 5000))
DIM = 64

rng = np.random.default_rng(0)
vectors = rng.standard_normal((N, DIM)).astype(np.float32)
queries = vectors[:5] + 0.01 * rng.standard_normal((5, DIM)).astype(np.float32)

# CREATE INDEX ... WITH (m=16, ef_construction=128)
ix = Index(HnswParams(dim=DIM, m=16, ef_construction=128), capacity=N)
ix.add(vectors)                      # host engine build; build="device" bulk-builds on TPU
print(ix)

# ORDER BY v <-> q LIMIT 10 — batched on the device.
# mode="auto" picks flat MXU scan vs graph traversal like a query planner.
dists, labels = ix.search(queries, k=10)
print("top-1 labels:", labels[:, 0], "(expect 0..4)")
assert (labels[:, 0] == np.arange(5)).all()

# snapshot round trip (the index file is its own checkpoint)
with tempfile.TemporaryDirectory() as td:
    path = os.path.join(td, "index.ldb")
    ix.save(path)
    ix2 = Index.load(path)
    d2, l2 = ix2.search(queries, k=10)
    assert (l2 == labels).all()
print("snapshot round trip: OK")

# tombstone deletes (no reclaim — reference delete.c semantics)
ix.delete(np.arange(5))
_, l3 = ix.search(queries, k=10)
assert not np.isin(l3, np.arange(5)).any()
print("delete: OK")

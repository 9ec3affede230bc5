"""Product quantization with two-stage rerank search.

PQ stores 8-bit subvector codes (16-32x smaller than f32); the ADC scan
alone loses recall at high dimension, and `search(rerank=L)` re-scores an
ADC shortlist against the full-precision rows to recover it.

Run: python examples/pq_rerank.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lantern_tpu import HnswParams, Index
from lantern_tpu.ops import exact_search

N = int(os.environ.get("EXAMPLE_N", 4000))
DIM = 96

rng = np.random.default_rng(0)
vectors = rng.standard_normal((N, DIM)).astype(np.float32)
queries = rng.standard_normal((8, DIM)).astype(np.float32)

ix = Index(
    HnswParams(dim=DIM, m=16, ef_construction=64, pq=True,
               num_subvectors=24, num_centroids=64),
    capacity=N,
)
ix.add(vectors)  # trains the codebook on the first batch, keeps raw rows

_, true_ids = exact_search(queries, vectors, k=10)


def recall(labels):
    return np.mean([
        len(set(int(x) for x in got) & set(exp.tolist())) / 10
        for got, exp in zip(np.asarray(labels), np.asarray(true_ids))
    ])


_, raw = ix.search(queries, k=10, mode="flat")        # ADC over codes
_, rr = ix.search(queries, k=10, rerank=100)          # + exact rerank
print(f"recall@10: ADC alone {recall(raw):.3f} -> reranked {recall(rr):.3f}")
assert recall(rr) >= recall(raw)

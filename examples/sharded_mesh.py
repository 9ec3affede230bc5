"""Multi-chip sharded index over a jax.sharding.Mesh.

Subgraphs build IN PARALLEL (vmapped insert rounds over the shard axis)
and search runs SPMD with one top-k merge collective per query batch.
Without real chips this demonstrates on a virtual 8-device CPU mesh.

Run: python examples/sharded_mesh.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# single-device or explicitly-requested CPU runs use the virtual mesh;
# decide via env BEFORE any device query (which locks the platform)
if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lantern_tpu import HnswParams
from lantern_tpu.ops import exact_search
from lantern_tpu.parallel import build_sharded_device, make_mesh, search_sharded

N = int(os.environ.get("EXAMPLE_N", 4000))
DIM = 32

rng = np.random.default_rng(0)
vectors = rng.standard_normal((N, DIM)).astype(np.float32)
queries = rng.standard_normal((16, DIM)).astype(np.float32)

mesh = make_mesh(n_shards=min(8, len(jax.devices())))
print("mesh:", mesh)

ix = build_sharded_device(vectors, HnswParams(dim=DIM, m=8, ef_construction=48), mesh)
dists, global_ids, labels = search_sharded(ix, jnp.asarray(queries), k=10, ef=48)

_, true_ids = exact_search(jnp.asarray(queries), jnp.asarray(vectors), k=10)
rec = np.mean([
    len(set(a[a >= 0].tolist()) & set(b.tolist())) / 10
    for a, b in zip(np.asarray(global_ids), np.asarray(true_ids))
])
print(f"sharded recall@10 = {rec:.3f} over {mesh.shape['shard']} shards")
assert rec > 0.8

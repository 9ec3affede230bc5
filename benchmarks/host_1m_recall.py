"""Builder-quality evidence at 1M: sequential native build on the SAME data
as bench.py's n1m config (jax threefry is backend-deterministic, so the CPU
backend reproduces the TPU data bit-for-bit), searched by the native engine
at the same efs. Compare `recall` here against BENCH's n1m
graph.ef*.recall_device_build — the device builder must stay within ~0.02
(VERDICT r1 #2). Writes benchmarks/host_1m_recall.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lantern_tpu.config import HnswParams
from lantern_tpu.native import NativeHnsw

N, DIM, K, NQ = 1_000_000, 128, 10, 256

base = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (N, DIM), jnp.float32))
queries = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (1024, DIM), jnp.float32))[:NQ]

# exact ground truth, blocked numpy
t0 = time.perf_counter()
q_sq = (queries * queries).sum(1)
best_d = np.full((NQ, K), np.inf, np.float32)
best_i = np.full((NQ, K), -1, np.int64)
B = 100_000
for off in range(0, N, B):
    blk = base[off : off + B]
    d = q_sq[:, None] - 2.0 * queries @ blk.T + (blk * blk).sum(1)[None, :]
    cat_d = np.concatenate([best_d, d], 1)
    cat_i = np.concatenate([best_i, np.arange(off, off + blk.shape[0])[None, :].repeat(NQ, 0)], 1)
    sel = np.argpartition(cat_d, K - 1, axis=1)[:, :K]
    best_d = np.take_along_axis(cat_d, sel, 1)
    best_i = np.take_along_axis(cat_i, sel, 1)
gt = [set(row.tolist()) for row in best_i]
print(f"ground truth: {time.perf_counter()-t0:.0f}s", flush=True)

p = HnswParams(dim=DIM, m=16, ef_construction=128)
snap = os.path.join(os.path.dirname(__file__), "host_1m.ldb")
if os.path.exists(snap):
    from lantern_tpu.storage.snapshot import load_snapshot

    eng = load_snapshot(snap, engine="native")
    build_s = -1.0  # loaded from snapshot; see a prior run for the time
    print("loaded prior host build from snapshot", flush=True)
else:
    eng = NativeHnsw(p, capacity=N, seed=0)
    t0 = time.perf_counter()
    eng.add(base, nthreads=1)
    build_s = time.perf_counter() - t0
    print(f"host sequential build: {build_s:.0f}s", flush=True)
    from lantern_tpu.storage.snapshot import save_snapshot

    save_snapshot(eng, snap)

out = {"n": N, "dim": DIM, "m": 16, "ef_construction": 128,
       "build_host_s": round(build_s, 1), "recall_host_build": {}}
for ef in (64, 128, 256):
    hits = 0
    for i in range(NQ):
        ids, _ = eng.search(queries[i], k=K, ef=ef)  # (ids, dists)
        hits += len(set(int(x) for x in ids[:K]) & gt[i])
    out["recall_host_build"][f"ef{ef}"] = round(hits / (NQ * K), 4)
    print(f"ef{ef}: recall {out['recall_host_build'][f'ef{ef}']}", flush=True)

with open("benchmarks/host_1m_recall.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))

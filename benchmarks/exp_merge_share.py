"""Back the beyond-HBM projection mechanically (VERDICT r3 #10).

BASELINE.md projects ~3.4B PQ-coded rows on a v5e-8 pod from single-chip
numbers, on the argument that the sharded flat ADC scan's only collective
is the [S, Q, k] result merge. This script measures that merge's share of
a full sharded batch at projected shapes: 8 shards x 2M codes (32 B/vec,
128 d) on the 8-device virtual CPU mesh (the same harness the sharded
test suite uses — run standalone: JAX_PLATFORMS is forced to cpu below).

Two timed programs over identical sharded inputs:
  full  — vmap(flat_search_pq) over the shard axis + _merge_topk
          (the flat_search_sharded structure, minus Index bookkeeping)
  scan  — the same minus the merge (per-shard [S, Q, k] results only)
merge share = (full - scan) / full.

Caveat, recorded in the artifact: on real TPU chips the per-shard scan is
~100x faster than this 1-core CPU interpret run while the merge payload
is unchanged ([S, Q, k] = 8 x Q x 10 rows of (f32 d, i32 gid, 2xu32
label) ~= 1.6 KB/query), so the CPU-mesh share is a structural check, not
a hardware number. The artifact therefore also models the merge at TPU
rates: payload / ICI bandwidth + the measured single-chip top-k cost,
against the measured single-chip 2M-code ADC scan time (bench_full.json
flat_pq leg), reference scale anchor: external build x PQ is how lantern
scales past one box (lantern_hnsw/src/hnsw/build.c:497-501).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from lantern_tpu.flat import flat_search_pq  # noqa: E402
from lantern_tpu.parallel.sharded import _merge_topk  # noqa: E402

NSHARD = 8
# default sized for THIS box: 8 x 2M codes never finished the scan-only
# phase inside an hour on the 1 CPU core (r5) — the merge share is a
# structural ratio, and the TPU-rate modeling below anchors the projected
# shapes; raise via MERGE_N_PER on a bigger host.
N_PER = int(os.environ.get("MERGE_N_PER", 250_000))
S, KC, DSUB = 32, 256, 4
DIM = S * DSUB
Q = int(os.environ.get("MERGE_Q", 128))
K = 10


def _stage(msg):
    print(f"[merge {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    devs = jax.devices()
    assert len(devs) >= NSHARD, devs
    mesh = Mesh(np.array(devs[:NSHARD]), ("s",))
    shard = NamedSharding(mesh, P("s"))
    repl = NamedSharding(mesh, P())

    _stage(f"data: {NSHARD} x {N_PER} codes")
    # per-shard codes generated shard-locally (device_put of a host array
    # this large would be one big copy; jit the generation sharded instead)
    @jax.jit
    def gen(keys):
        def one(key):
            return jax.random.randint(key, (N_PER, S), 0, 256, jnp.uint8)
        return jax.vmap(one)(keys)

    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), NSHARD), shard)
    codes = jax.device_put(gen(keys), shard)          # [8, N_PER, S]
    cents = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (S, KC, DSUB), jnp.float32),
        repl)
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (Q, DIM), jnp.float32),
        repl)
    gids = jax.device_put(
        (jnp.arange(NSHARD, dtype=jnp.int32)[:, None] * N_PER
         + jnp.arange(N_PER, dtype=jnp.int32)[None, :]), shard)

    def local(c, g):
        d, ids = flat_search_pq(c, cents, queries, k=K)
        gid = jnp.where(ids >= 0, g[jnp.clip(ids, 0, N_PER - 1)], -1)
        lab = jnp.stack([gid.astype(jnp.uint32),
                         jnp.zeros_like(gid, jnp.uint32)], axis=-1)
        return d, gid, lab

    @jax.jit
    def scan_only(codes, gids, queries):
        d, gid, lab = jax.vmap(
            lambda c, g: local(c, g)
        )(codes, gids)
        # scalar result keeps the program comparable without the merge
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0)) + jnp.sum(gid)

    @jax.jit
    def full(codes, gids, queries):
        d, gid, lab = jax.vmap(
            lambda c, g: local(c, g)
        )(codes, gids)
        md, mgid, mlab = _merge_topk(d, gid, lab, K)
        return jnp.sum(jnp.where(jnp.isfinite(md), md, 0)) + jnp.sum(mgid)

    def timed(fn, reps=2):
        _ = float(fn(codes, gids, queries))
        best = float("inf")
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(fn(codes, gids, queries))
            best = min(best, time.perf_counter() - t0)
        return best

    _stage("scan-only")
    t_scan = timed(scan_only)
    _stage(f"scan-only {t_scan:.2f} s; full")
    t_full = timed(full)
    share = max(0.0, (t_full - t_scan) / t_full)
    _stage(f"full {t_full:.2f} s; merge share {share:.4f}")

    # TPU-rate model for the same merge: payload all-gathered per batch
    payload_bytes = NSHARD * Q * K * (4 + 4 + 8)
    ici_gbps = 100e9  # v5e per-link ICI, conservative one-direction
    tpu_scan_s = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "bench_full.json")) as f:
            bf = json.load(f)
        qps = bf["configs"]["n1m"]["flat_pq"]["qps"]
        # single-chip 1M-code batch time, scaled to 2M codes per shard
        tpu_scan_s = (1024 / qps) * (N_PER / 1e6)
    except Exception:  # noqa: BLE001
        pass
    model = {
        "merge_payload_bytes_per_batch": payload_bytes,
        "ici_transfer_s_modeled": payload_bytes / ici_gbps,
        "tpu_per_shard_scan_s_measured": tpu_scan_s,
        "tpu_merge_share_modeled": (
            round(payload_bytes / ici_gbps / max(tpu_scan_s, 1e-12), 6)
            if tpu_scan_s else None
        ),
    }
    out = {
        "n_shards": NSHARD, "codes_per_shard": N_PER, "q": Q, "k": K,
        "cpu_mesh": {
            "scan_only_s": round(t_scan, 3),
            "full_s": round(t_full, 3),
            "merge_share": round(share, 4),
        },
        "tpu_model": model,
        "note": (
            "CPU-mesh share is a structural check (1-core interpret scan "
            "is ~100x slower than a TPU shard scan; merge payload is "
            "identical). tpu_merge_share_modeled uses the measured "
            "single-chip ADC scan time and a conservative 100 GB/s ICI."
        ),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "merge_share_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

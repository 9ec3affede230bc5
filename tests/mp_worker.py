"""Multi-process mesh worker — run by test_multiprocess.py.

Each of 2 local processes hosts 4 virtual CPU devices; jax.distributed
joins them into one 8-device (DCN-connected) mesh — the local-process-group
analog of the reference's replica tests (lantern_hnsw/scripts/test_wal.py
spins up primary+replica postgres processes on one machine).

Usage: python mp_worker.py <coordinator_port> <process_id> <out_json>
Builds a deterministic sharded index over the GLOBAL mesh, runs a sharded
search, and writes the (all-gathered) results as JSON from every process.
"""

import json
import os
import sys


def main():
    port, pid, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lantern_tpu.parallel.sharded import init_multihost

    init_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, "global device list must span processes"

    import numpy as np

    from lantern_tpu.config import HnswParams
    from lantern_tpu.parallel.sharded import (
        build_sharded,
        make_mesh,
        search_sharded,
    )

    rng = np.random.default_rng(40)
    base = rng.standard_normal((800, 16)).astype(np.float32)
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    p = HnswParams(dim=16, m=8, ef_construction=32)
    mesh = make_mesh(n_shards=8)
    ix = build_sharded(base, p, mesh, seed=0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    q_global = jax.make_array_from_callback(
        queries.shape, NamedSharding(mesh, P()), lambda idx: queries[idx]
    )
    d, gids, _ = search_sharded(ix, q_global, k=5, ef=32)
    from jax.experimental import multihost_utils

    # tiled=True assembles the global [Q, k] arrays on every process
    d_np = np.asarray(multihost_utils.process_allgather(d, tiled=True))
    g_np = np.asarray(multihost_utils.process_allgather(gids, tiled=True))
    with open(out_path, "w") as f:
        json.dump({"dists": d_np.tolist(), "gids": g_np.tolist(),
                   "process_count": jax.process_count()}, f)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()

"""Measure the full external-build pipeline at 1M over the REAL socket.

The reference's flagship workflow: a client streams millions of tuples to
an indexing server over TCP, the server builds with all its compute, and
streams the serialized index back (client external_index_socket.c:517-536,
server server.rs:214-267,377-434). Here: the repo's wire protocol v1, the
asyncio IndexServer in a SEPARATE process with build="device" (TPU bulk
build), 1M x 128d f32 tuples, estimated_capacity deliberately
under-provisioned 4x (250k) to prove the server survives a stream that
exceeds its estimate at scale.

Phases reported (external_build_1m_result.json): ingest tuples/s, device
build wall (server-side, observed as the client's wait between END and the
count reply), index stream-back s + bytes, end-to-end wall, and recall@10
of the imported index vs an exact scan.

TPU discipline: the SERVER owns the chip while it lives; the client
process runs no jax until the server has exited (one-TPU-process rule,
CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import socket
import struct
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("EB_N", 1_000_000))
DIM = int(os.environ.get("EB_DIM", 128))
PORT = int(os.environ.get("EB_PORT", 19971))
STATUS_PORT = PORT + 1


def wait_port(port: int, timeout: float = 120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"server port {port} never opened")


def main():
    import numpy as np

    rng = np.random.default_rng(0)
    print("generating 1M x 128 on host...", flush=True)
    base = rng.standard_normal((N, DIM)).astype(np.float32)

    env = dict(os.environ)
    srv = subprocess.Popen(
        [sys.executable, "-m", "lantern_tpu.cli", "start-indexing-server",
         "--port", str(PORT), "--status-port", str(STATUS_PORT),
         "--build", "device"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    out = {"n": N, "dim": DIM, "server_build": "device",
           "estimated_capacity": N // 4}
    try:
        wait_port(PORT)
        # no jax in THIS process while the server owns the TPU
        from lantern_tpu.config import HnswParams
        from lantern_tpu.service.client import ExternalIndexClient

        params = HnswParams(dim=DIM, m=16, ef_construction=128)
        client = ExternalIndexClient("127.0.0.1", PORT, timeout=30.0,
                                     reply_timeout=3600.0)
        # under-provision the capacity hint 4x (build.c EstimateRowCount can
        # be wrong the same way) — the server must still index everything
        t0 = time.perf_counter()
        data = _build_with_capacity(client, base, params, N // 4)
        e2e = time.perf_counter() - t0
        out.update(client.last_timings)
        out["end_to_end_s"] = round(e2e, 2)
        print(f"e2e {e2e:.1f}s: {client.last_timings}", flush=True)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=60)
        except subprocess.TimeoutExpired:
            srv.kill()
            srv.wait()

    # ---- server gone; import + score on the TPU in this process ----
    import tempfile

    from lantern_tpu.index import Index

    with tempfile.NamedTemporaryFile(suffix=".ldb", delete=False) as tf:
        tf.write(data)
        path = tf.name
    try:
        t0 = time.perf_counter()
        ix = Index.load(path, extra_capacity=1024)
        out["import_s"] = round(time.perf_counter() - t0, 2)
        out["imported_n"] = int(ix.size)
    finally:
        os.unlink(path)

    import jax.numpy as jnp

    from lantern_tpu.flat import flat_search

    nq = 256
    q = jnp.asarray(base[rng.choice(N, nq, replace=False)]
                    + 0.05 * rng.standard_normal((nq, DIM)).astype(np.float32))
    g = ix.device_graph
    _, tids = flat_search(g.vectors, g.sq_norms, q, k=10, metric=g.metric,
                          exact=True)
    true_np = np.asarray(tids)
    _, labels = ix.search(np.asarray(q), k=10, mode="graph", ef=64)
    rec = float(np.mean([
        len(set(int(x) for x in labels[i]) & set(true_np[i].tolist())) / 10
        for i in range(nq)]))
    out["recall_ef64"] = round(rec, 4)
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "external_build_1m_result.json"), "w") as f:
        json.dump(out, f, indent=1)


def _build_with_capacity(client, vectors, params, capacity: int) -> bytes:
    """client.build, but with the init frame's estimated_capacity forced
    to an under-estimate (the public path derives it from len(vectors))."""
    from unittest import mock

    from lantern_tpu.service import protocol as proto

    real = proto.InitParams.from_hnsw_params.__func__

    def patched(cls, p, n):
        init = real(cls, p, n)
        init.estimated_capacity = capacity
        return init

    with mock.patch.object(proto.InitParams, "from_hnsw_params",
                           classmethod(patched)):
        return client.build(vectors, params)


if __name__ == "__main__":
    main()

"""Multi-process mesh test (SURVEY §4 implication (f)): two local processes
join one 8-device mesh via jax.distributed and must produce search results
identical to the single-process mesh — the reference's local-process-group
replica testing model (scripts/test_wal.py:8-40)."""

import json
import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from lantern_tpu.config import HnswParams
from lantern_tpu.parallel.sharded import build_sharded, make_mesh, search_sharded


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multiprocess_mesh_parity(tmp_path):
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    port = _free_port()
    outs = [str(tmp_path / f"out_{i}.json") for i in range(2)]
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        # workers set their own JAX_PLATFORMS/XLA_FLAGS (4 devices each)
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
        # cache dir: workers import lantern_tpu, which picks the
        # machine-fingerprinted default (stale cross-machine CPU AOT
        # entries abort on deserialize)
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "mp_worker.py"),
             str(port), str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 for r in results)
    # both processes observed identical global results
    np.testing.assert_array_equal(results[0]["gids"], results[1]["gids"])

    # and they match the single-process mesh bit-for-bit (same seeds)
    rng = np.random.default_rng(40)
    base = rng.standard_normal((800, 16)).astype(np.float32)
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    ix = build_sharded(base, HnswParams(dim=16, m=8, ef_construction=32),
                       make_mesh(n_shards=8), seed=0)
    d, gids, _ = search_sharded(ix, jnp.asarray(queries), k=5, ef=32)
    np.testing.assert_array_equal(np.asarray(gids), results[0]["gids"])
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(results[0]["dists"], np.float32), rtol=1e-5
    )

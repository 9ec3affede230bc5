"""Diagnose the clustered-build 'cliff' (VERDICT r3 weak #1).

clustered_1m_result.json shows 194.9 s at jitter 0.35 vs 54.0 s at jitter
0.80 for the SAME fixed-shape build program. Two hypotheses:
  A) compile time: jitter 0.35 ran first in that process and paid the
     remote-compile tunnel for every insert_rounds shape; jitter 0.80
     reused the warm jit cache.
  B) data-dependent execution inside fixed-shape dispatches.

This experiment builds TWICE per jitter in one process (second build =
fully warm) and prints both times. If warm(0.35) ~= warm(0.80), the cliff
was compile, and the fix is measurement methodology (+ the persistent
compile cache); if warm(0.35) >> warm(0.80), it is real data dependence
and needs a per-round trace.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import lantern_tpu  # noqa: F401, E402  (compile cache)
from lantern_tpu.config import HnswParams  # noqa: E402
from lantern_tpu.graph.build_device import build_on_device  # noqa: E402

N = int(os.environ.get("EXP_N", 1 << 20))
DIM = 128
BATCH = 1024
JITTERS = (0.35, 0.80)


def make_data(jitter, n_centers=4096):
    centers = jax.random.normal(jax.random.PRNGKey(0), (n_centers, DIM),
                                jnp.float32)
    assign = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, n_centers)
    base = centers[assign] + jitter * jax.random.normal(
        jax.random.PRNGKey(2), (N, DIM), jnp.float32
    )
    return jax.block_until_ready(base)


def build_once(base, params):
    t0 = time.perf_counter()
    g = build_on_device(base, params, batch=BATCH, seed=0)
    _ = int(jnp.sum(g.levels))  # scalar fetch = completion barrier
    dt = time.perf_counter() - t0
    del g
    return dt


def main():
    params = HnswParams(dim=DIM, m=16, ef_construction=128)
    out = {"n": N}
    for jitter in JITTERS:
        base = make_data(jitter)
        t_cold = build_once(base, params)
        t_warm = build_once(base, params)
        out[f"jitter_{jitter}"] = {"cold_s": round(t_cold, 1),
                                   "warm_s": round(t_warm, 1)}
        print(f"jitter={jitter}: cold {t_cold:.1f}s warm {t_warm:.1f}s",
              file=sys.stderr, flush=True)
        del base
    print(json.dumps(out))


if __name__ == "__main__":
    main()

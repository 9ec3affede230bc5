"""Measure the TPU's random-row-gather rate — the beam search's roofline.

The 1M graph beam search is dominated by the per-iteration candidate
vector gather ([Q*C] random rows from [N, d]). CLAUDE.md pins that TPU row
gathers are row-LATENCY-bound, not byte-bound; this script measures the
actual rows/s curve so the beam's floor can be computed as
    QPS_floor = gather_rate_rows_per_s / visited_rows_per_query.

Legs (each one jitted lax.scan, >= 48 in-jit iterations, indices varied
per iteration so XLA cannot hoist the body — CLAUDE.md discipline):
  - rate vs R (rows per gather): 16k .. 512k, random ids in [0, N)
  - id locality: ids confined to a 64k-row window (HBM row-buffer hits?)
  - sorted ids within the gather
  - narrow rows: u8 PQ-code table [N, 16] (byte-vs-latency check)
  - f32 vs bf16 row width
  - search-shaped: gather + qd,qcd->qc einsum fused ([1024, C] ids)

Writes benchmarks/gather_rate_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("GR_N", 1_000_000))
DIM = int(os.environ.get("GR_DIM", 128))
ITERS = int(os.environ.get("GR_ITERS", 48))
REPS = int(os.environ.get("GR_REPS", 3))


def main():
    import jax
    import jax.numpy as jnp

    out = {"n": N, "dim": DIM, "iters": ITERS,
           "device": str(jax.devices()[0])}

    key = jax.random.PRNGKey(0)
    tab_bf16 = jax.random.normal(key, (N, DIM), jnp.float32).astype(jnp.bfloat16)
    tab_f32 = tab_bf16.astype(jnp.float32)
    tab_u8 = jax.random.randint(key, (N, 16), 0, 255, jnp.int32).astype(jnp.uint8)

    def timed(fn, *args):
        _ = float(jax.block_until_ready(fn(*args)))  # compile + warm
        best = 1e18
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(jax.block_until_ready(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    def gather_scan(tab, r, mode):
        base = jax.random.randint(jax.random.PRNGKey(r), (r,), 0, N, jnp.int32)

        @jax.jit
        def run(tab, base):
            def body(acc, i):
                ids = (base + i * 7919) % N
                if mode == "window64k":
                    ids = ids % 65536
                elif mode == "sorted":
                    ids = jnp.sort((base * (i + 1) + i) % N)
                rows = tab[ids]
                # consume every byte so the gather cannot be narrowed
                return acc + jnp.sum(rows.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return acc
        t = timed(run, tab, base)
        return t / ITERS  # s per gather of r rows

    # --- leg 1: rate vs R, random ids, bf16 128d rows ---
    rate = {}
    for r in (16384, 32768, 65536, 131072, 262144, 524288):
        s = gather_scan(tab_bf16, r, "random")
        rate[str(r)] = {"s_per_gather": round(s, 6),
                        "ns_per_row": round(s / r * 1e9, 2),
                        "rows_per_s": round(r / s, 0),
                        "gbps": round(r * DIM * 2 / s / 1e9, 2)}
        print(f"bf16 random R={r}: {s/r*1e9:.1f} ns/row "
              f"{r*DIM*2/s/1e9:.1f} GB/s", file=sys.stderr, flush=True)
    out["bf16_random"] = rate

    # --- leg 2/3: locality + sorted at the search-shaped R ---
    r = 65536
    for mode in ("window64k", "sorted"):
        s = gather_scan(tab_bf16, r, mode)
        out[f"bf16_{mode}_R{r}"] = {"ns_per_row": round(s / r * 1e9, 2),
                                    "gbps": round(r * DIM * 2 / s / 1e9, 2)}
        print(f"bf16 {mode} R={r}: {s/r*1e9:.1f} ns/row",
              file=sys.stderr, flush=True)

    # --- leg 4: narrow u8 code rows (16 B) — latency vs bytes ---
    s = gather_scan(tab_u8, r, "random")
    out["u8_16B_random_R65536"] = {"ns_per_row": round(s / r * 1e9, 2),
                                   "gbps": round(r * 16 / s / 1e9, 3)}
    print(f"u8[16] random R={r}: {s/r*1e9:.1f} ns/row",
          file=sys.stderr, flush=True)

    # --- leg 5: f32 row width ---
    s = gather_scan(tab_f32, r, "random")
    out["f32_random_R65536"] = {"ns_per_row": round(s / r * 1e9, 2),
                                "gbps": round(r * DIM * 4 / s / 1e9, 2)}
    print(f"f32 random R={r}: {s/r*1e9:.1f} ns/row",
          file=sys.stderr, flush=True)

    # --- leg 6: search-shaped gather + einsum (the actual loop body) ---
    q = 1024
    for c in (32, 64, 128, 256):
        base = jax.random.randint(jax.random.PRNGKey(c), (q, c), 0, N, jnp.int32)
        queries = jax.random.normal(jax.random.PRNGKey(1), (q, DIM), jnp.float32)

        @jax.jit
        def run(tab, base, queries):
            def body(acc, i):
                ids = (base + i * 7919) % N
                rows = tab[ids]  # [q, c, DIM]
                dots = jnp.einsum("qd,qcd->qc", queries,
                                  rows.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
                return acc + jnp.sum(dots), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return acc
        t = timed(run, tab_bf16, base, queries) / ITERS
        rr = q * c
        out[f"bf16_gather_einsum_Q{q}_C{c}"] = {
            "ns_per_row": round(t / rr * 1e9, 2),
            "s_per_iter": round(t, 6)}
        print(f"gather+einsum Q={q} C={c}: {t/rr*1e9:.1f} ns/row "
              f"({t*1e3:.2f} ms/iter)", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(__file__), "gather_rate_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

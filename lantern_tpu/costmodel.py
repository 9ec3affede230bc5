"""Analytic HNSW cost model — the planner's cost estimator, TPU-flavored.

Ports the reference's query cost model (lantern_hnsw/src/hnsw.c:89-145):
  mL          = 1 / ln(M)
  E[levels]   = ln(1 + n) * mL
  S (stop Pr) = 1 / (1 - e^{-mL})
  E[visited upper] ≈ levels * M * S
  E[visited L0]    ≈ ef * M * S
used there to estimate page fetches for the Postgres planner; used here to
plan batch sizes, search iteration bounds, and HBM traffic per query batch.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SearchCost:
    expected_levels: float
    expected_visited: float      # node visits per query
    expected_iters: int          # beam-search iterations (level 0)
    hbm_bytes_per_batch: int     # candidate vector+adjacency traffic
    flops_per_batch: int

    @property
    def summary(self) -> str:
        return (
            f"levels≈{self.expected_levels:.1f} visited≈{self.expected_visited:.0f} "
            f"iters≈{self.expected_iters} HBM/batch={self.hbm_bytes_per_batch/2**20:.1f}MiB"
        )


def estimate_search_cost(
    n: int,
    dim: int,
    m: int,
    ef: int,
    batch: int,
    expand: int = 1,
    dtype_bytes: int = 4,
) -> SearchCost:
    ml = 1.0 / math.log(m)
    levels = math.log(1 + max(n, 1)) * ml
    s = 1.0 / (1.0 - math.exp(-ml))
    visited_upper = levels * m * s
    visited_l0 = ef * m * s
    visited = visited_upper + visited_l0
    # each beam iteration expands `expand` nodes -> 2M*expand candidates
    iters = max(1, math.ceil(ef / expand) + 4)
    cand_per_iter = 2 * m * expand
    bytes_per_iter = batch * cand_per_iter * (dim * dtype_bytes + 4)
    flops_per_iter = batch * cand_per_iter * dim * 2
    return SearchCost(
        expected_levels=levels,
        expected_visited=visited,
        expected_iters=iters,
        hbm_bytes_per_batch=iters * bytes_per_iter,
        flops_per_batch=iters * flops_per_iter,
    )


def estimate_build_rows(first_block_live: int, total_blocks: int) -> int:
    """Row-count estimate from first-block density (utils.c:228-249 analog)."""
    return max(first_block_live, 1) * max(total_blocks, 1)


# ---- strategy dispatch (the planner's seq-scan vs index-scan choice) ----

# measured v5e effective rates for the two strategies (BASELINE.md r2):
# flat scan streams the table through the MXU at ~50-200 GB/s effective;
# graph search pays ~`iters` serialized HBM random-gather rounds.
FLAT_HBM_BUDGET_BYTES = 8 << 30  # leave headroom out of 16 GB v5e HBM


def choose_search_strategy(
    n: int,
    width: int,
    itemsize: int,
    quant_is_pq: bool = False,
    hbm_budget: int = FLAT_HBM_BUDGET_BYTES,
) -> str:
    """'flat' or 'graph' — the TPU analog of the reference planner choosing
    between a sequential scan and the index (hnswcostestimate's purpose,
    hnsw.c:150-209). On TPU the dense MXU scan dominates graph traversal at
    every scale where the stored table fits HBM (measured: ~200k vs ~3k QPS
    at 1M x 128d), so the only reason to traverse the graph is a table too
    large to scan-resident. PQ codes also scan flat (decode-on-MXU ADC,
    flat.flat_search_pq) — their stored bytes are the smallest of all."""
    if n * width * itemsize > hbm_budget:
        return "graph"
    del quant_is_pq  # kept for call-site compatibility; PQ scans flat too
    return "flat"

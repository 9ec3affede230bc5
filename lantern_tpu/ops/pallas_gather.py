"""Fused gather+distance Pallas kernel — the search hot loop's HBM path.

XLA's row gather on TPU is latency-bound (~6 GB/s effective measured at
200k×128d for [Q, C] row gathers); this kernel issues the candidate-row DMAs
explicitly with double buffering: while query i's candidate block computes
on the MXU, query i+1's rows are already in flight. The distance math is
fused (no [Q, C, d] intermediate ever hits HBM).

Used by graph.search when DeviceGraph.use_pallas is set (l2sq/cos over
f32/bf16 vectors); interpret mode keeps it testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lantern_tpu.config import Metric


def _kernel(ids_ref, q_ref, qsq_ref, vec_hbm, out_ref, scratch, sems, *, c_real,
             metric, qb):
    """One program handles QB queries; candidate rows DMA'd per query with
    double buffering (slot = query parity)."""

    def issue(qi, slot):
        # start DMAs for query qi's candidate rows into scratch[slot]
        def issue_one(ci, _):
            rid = ids_ref[qi, ci]
            pltpu.make_async_copy(
                vec_hbm.at[rid], scratch.at[slot, ci], sems.at[slot, ci]
            ).start()
            return 0

        jax.lax.fori_loop(0, c_real, issue_one, 0)

    def wait(slot):
        def wait_one(ci, _):
            # wait on the per-row semaphore (copy shape must match)
            pltpu.make_async_copy(
                vec_hbm.at[ids_ref[0, 0]], scratch.at[slot, ci], sems.at[slot, ci]
            ).wait()
            return 0

        jax.lax.fori_loop(0, c_real, wait_one, 0)

    issue(0, 0)

    def body(qi, _):
        slot = jax.lax.rem(qi, 2)

        @pl.when(qi + 1 < qb)
        def _():
            issue(qi + 1, jax.lax.rem(qi + 1, 2))

        wait(slot)
        vecs = scratch[slot].astype(jnp.float32)  # [Cp, d]
        qv = q_ref[qi, :].astype(jnp.float32)     # [d]
        dots = jnp.dot(vecs, qv, preferred_element_type=jnp.float32)  # [Cp]
        if metric == int(Metric.L2SQ):
            norms = jnp.sum(vecs * vecs, axis=1)
            dist = qsq_ref[qi, 0] - 2.0 * dots + norms
        else:  # cosine
            norms = jnp.sqrt(jnp.sum(vecs * vecs, axis=1))
            qn = jnp.sqrt(qsq_ref[qi, 0])
            dist = 1.0 - dots / jnp.maximum(qn * norms, 1e-30)
        cp = out_ref.shape[1]
        if cp > dist.shape[0]:
            dist = jnp.concatenate(
                [dist, jnp.zeros((cp - dist.shape[0],), jnp.float32)]
            )
        out_ref[qi, :] = dist
        return 0

    jax.lax.fori_loop(0, qb, body, 0)


@functools.partial(
    jax.jit, static_argnames=("metric", "qb", "interpret")
)
def gather_dists_pallas(
    vectors: jax.Array,   # [N, d] f32/bf16 (HBM)
    ids: jax.Array,       # [Q, C] int32, pre-clipped to [0, N)
    queries: jax.Array,   # [Q, d]
    q_sq: jax.Array,      # [Q] f32
    metric: int = int(Metric.L2SQ),
    qb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused candidate distances: out[q, c] = dist(queries[q], vectors[ids[q,c]])."""
    q, c = ids.shape
    n, d = vectors.shape
    qb = min(qb, q)
    # pad Q to a qb multiple; C padded to the lane width for the output tile
    qp = -(-q // qb) * qb
    cp = max(-(-c // 128) * 128, 128)
    ids_p = jnp.pad(ids, ((0, qp - q), (0, 0)))
    queries_p = jnp.pad(queries, ((0, qp - q), (0, 0)))
    qsq_p = jnp.pad(q_sq, (0, qp - q))[:, None]

    out = pl.pallas_call(
        functools.partial(_kernel, c_real=c, metric=int(metric), qb=qb),
        out_shape=jax.ShapeDtypeStruct((qp, cp), jnp.float32),
        grid=(qp // qb,),
        in_specs=[
            pl.BlockSpec((qb, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, d), lambda i: (i, 0)),
            pl.BlockSpec((qb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # vectors stay in HBM
        ],
        out_specs=pl.BlockSpec((qb, cp), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, d), vectors.dtype),
            pltpu.SemaphoreType.DMA((2, c)),
        ],
        interpret=interpret,
    )(ids_p, queries_p, qsq_p, vectors)
    return out[:q, :c]

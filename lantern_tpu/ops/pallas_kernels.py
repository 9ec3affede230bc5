"""Pallas TPU kernels for ops XLA handles poorly.

Design policy (pallas_guide.md): let XLA own what it compiles well (row
gathers, matmuls, top-k) and hand-write only the ops with no good XLA
lowering. Currently:

- ``hamming_block``: all-pairs XOR+popcount distances. The jnp formulation
  materializes a [Q, N, W] u32 intermediate (4 GB for Q=256 x N=1M x 128-bit
  vectors); this kernel tiles the base into VMEM blocks and accumulates on
  the VPU with SWAR popcount — O(Q*N) output, no blowup. Used by the exact
  oracle and rerank paths for the hamming metric (`<+>` operator parity).

Each kernel has an interpret-mode path so the CPU test mesh exercises the
same code the TPU runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _popcount_u32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _hamming_kernel(q_ref, b_ref, out_ref):
    """One (Q-block, N-block) tile: out[i, j] = popcount(q[i] ^ b[j])."""
    q = q_ref[:]  # [QB, W] u32
    b = b_ref[:]  # [NB, W] u32
    # [QB, 1, W] xor [1, NB, W] stays in VMEM at tile size
    x = jnp.bitwise_xor(q[:, None, :], b[None, :, :])
    out_ref[:] = jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_n", "interpret")
)
def hamming_block(
    queries: jax.Array,
    base: jax.Array,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """All-pairs hamming distances: [Q, W] x [N, W] packed u32 -> [Q, N] f32.

    Tiled Pallas kernel; pads Q/N up to block multiples internally.
    """
    q, w = queries.shape
    n = base.shape[0]
    block_q = min(block_q, max(8, q))
    block_n = min(block_n, max(128, n))
    qp = -(-q // block_q) * block_q
    np_ = -(-n // block_n) * block_n
    queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    base = jnp.pad(base, ((0, np_ - n), (0, 0)))

    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((qp, np_), jnp.float32),
        grid=(qp // block_q, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_q, w), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, w), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_q, block_n), lambda i, j: (i, j)),
        interpret=interpret,
    )(queries, base)
    return out[:q, :n]


def hamming_exact_topk(
    queries: jax.Array,
    base: jax.Array,
    k: int,
    block_n: int = 65536,
    interpret: bool = False,
):
    """Exact hamming k-NN over a large packed base without materializing
    [Q, N]: per-block pallas distances + running top-k merge."""
    q = queries.shape[0]
    n = base.shape[0]
    k = min(k, n)
    best_d = jnp.full((q, k), jnp.inf, jnp.float32)
    best_i = jnp.full((q, k), -1, jnp.int32)
    for start in range(0, n, block_n):
        blk = base[start : start + block_n]
        d = hamming_block(queries, blk, interpret=interpret)
        neg, loc = jax.lax.top_k(-d, min(k, blk.shape[0]))
        ids = start + loc
        cat_d = jnp.concatenate([best_d, -neg], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(cat_i, arg, axis=1)
    return best_d, best_i
